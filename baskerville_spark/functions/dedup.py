"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the whole point of these over naive pairwise):
- **exact**: hash-groupBy on md5(text) — never shuffles the text itself,
  only (hash, id). Exemplar ids are bounded via a row_number window (an
  external, spillable sort) instead of collect_list, so a pathological
  text duplicated 10^9 times never materializes a 10^9-element array on
  one reducer.
- **n-gram Jaccard**: inverted-index self-join on shingles. The classic
  quadratic blowup is bounded by dropping shingles with document frequency
  > max_df (a stop-shingle filter) — standard trick; without it one common
  shingle joins the whole corpus to itself. Document sizes are computed
  over the SAME filtered shingle set as the pair counts, so the reported
  metric is exactly Jaccard over the max_df-filtered shingle space (equal
  to true Jaccard whenever no shingle exceeds max_df).
- **MinHash+LSH**: k hash functions h_i(s) = xxhash64(i || shingle), min per
  doc per i → signature; band hashes → bucket join → candidates; verified
  with exact Jaccard computed on the CANDIDATE DOCS ONLY (shingles are
  left-semi-joined to candidate ids before the pair join), so the verify
  cost is O(candidates), not O(corpus^2). All hashing via the built-in
  xxhash64 — zero Python.
- **SimHash**: 64 per-bit conditional sums over token hashes in ONE
  groupBy.agg — wide but JVM-side; near-dup candidates via band equality on
  16-bit chunks (Hamming <= 3 ⇒ at least one of 4 chunks equal), then an
  exact popcount(xor) filter — see ``simhash_near_dups``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = _tokens(text_col)
    k = F.size(toks) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.where(F.size(toks) >= n)
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    exemplar_k: int = 16,
    n_salt: int = 64,
) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, ids).

    ``ids`` holds at most ``exemplar_k`` exemplar ids (the smallest by sort
    order). Salted THREE-level aggregation (same structure and bound
    analysis as checks.uniqueness.duplicate_exemplars — see its docstring):
    level 0 round-robin-repartitions the (already count-filtered) rows and
    groups on (hash, spark_partition_id()) so each group is fully reduced
    map-side within one partition (buffer ≤ partition rows) and truncated
    to k BEFORE any cross-partition merge; level 1 merges ≤ P/n_salt
    truncated lists per (hash, pid % n_salt); level 2 merges ≤ n_salt lists.
    No single buffer ever holds more than max(split_rows, (P/n_salt)·k,
    n_salt·k) ids for any hot hash — unlike a two-level (hash, salt) form,
    whose reduce side still concatenates ~dup_count/n_salt ids before the
    slice, or the row_number-window form, which serializes a hot hash onto
    one reducer's external sort. Never ships text — only (hash, id).

    "Smallest k" is preserved exactly: every level contributes its own k
    smallest, and the global k smallest are a subset of that union.

    COUNT-FIRST pre-filter: an algebraic count per hash (map-side combined,
    skew-immune) finds the duplicated hashes, and a left_semi join restricts
    the list machinery to THOSE rows only. On real corpora duplicates are a
    small fraction, so the expensive collect_list levels see a sliver of the
    data; a pathological hot hash concentrates the semi join's probe side,
    which AQE skew-join splitting handles (joins split fine — unbounded
    aggregation buffers were the hazard). Measured at 20M rows / 10% hot
    key: the pre-filter pays for itself (bench.py --skew records it).

    NULL texts never form a duplicate group (the semi join's equality drops
    them) — a null payload is a schema-check concern, not a dedup one.
    """
    hashed = df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
    dup_hashes = (
        hashed.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where("__c > 1")
        .select("text_hash")
    )
    # Round-robin repartition is LOAD-BEARING: a sort-merge semi join
    # clusters rows BY HASH, making spark_partition_id() constant per hash
    # and collapsing level 0 into one dup_count-sized buffer; round-robin
    # restores partition-local groups under any join strategy (round-4
    # review catch; same fix in checks/uniqueness.duplicate_exemplars).
    hashed = hashed.join(dup_hashes, "text_hash", "left_semi").repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    phase0 = (
        hashed.withColumn("__pid", F.spark_partition_id())
        .groupBy("text_hash", "__pid")
        .agg(
            F.slice(F.sort_array(F.collect_list("id")), 1, exemplar_k).alias("partial_ids"),
            F.count(F.lit(1)).alias("partial_count"),
        )
    )
    phase1 = (
        phase0.withColumn("__salt", F.col("__pid") % n_salt)
        .groupBy("text_hash", "__salt")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("partial_ids"))), 1, exemplar_k
            ).alias("partial_ids"),
            F.sum("partial_count").alias("partial_count"),
        )
    )
    return (
        phase1.groupBy("text_hash")
        .agg(
            F.sum("partial_count").alias("dup_count"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("partial_ids"))), 1, exemplar_k
            ).alias("ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def exact_duplicates_window(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    exemplar_k: int = 16,
) -> DataFrame:
    """Window-form alternative to ``exact_duplicates`` (same output): a
    row_number over (hash, id) whose external sort SPILLS a hot key instead
    of OOMing — but runs it on ONE task. Kept as the comparison baseline for
    the property test; the salted two-phase form is the scale default.
    """
    hashed = df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
    counts = (
        hashed.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
    w = Window.partitionBy("text_hash").orderBy("id")
    exemplars = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= exemplar_k)
        .groupBy("text_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )
    return counts.join(exemplars, "text_hash").select("text_hash", "dup_count", "ids")


def _jaccard_pairs_over(sh: DataFrame, threshold: float, candidates: DataFrame | None) -> DataFrame:
    """Pair Jaccard from a (id, shingle) table; sizes and intersections use
    the SAME shingle set so the metric is internally consistent.

    ``candidates`` (id_a, id_b), when given, restricts the pair join to
    candidate docs (left-semi on the shingle table) and the output to
    candidate pairs — the LSH verify path.

    Plan shape: doc sizes ride along as a window count over ``id`` (bounded
    per-partition by a document's shingle count — never a skew trap) instead
    of two post-aggregation joins, so the a/b join branches are canonically
    identical and ReuseExchange computes the shingle subtree ONCE.
    """
    if candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias("id"))
            .unionByName(candidates.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sh = sh.join(cand_ids, "id", "left_semi")
    sized = sh.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("id"))
    )
    a = sized.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = sized.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    return (
        common.select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("double").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Document pairs with shingle-Jaccard >= threshold.

    inverted index → pair counts → |A∩B| / (|A|+|B|−|A∩B|). Shingles with
    document frequency > max_df are dropped BEFORE both the pair join and
    the size computation (stop-shingle guard against the quadratic join
    blowup at corpus scale); the metric is Jaccard over the filtered
    shingle space — identical to true Jaccard when nothing is filtered.
    """
    sh = word_shingles(df, id_col, text_col, n)
    low_df = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") <= max_df)
        .select("shingle")
    )
    filtered = sh.join(low_df, "shingle", "left_semi")
    return _jaccard_pairs_over(filtered, threshold, candidates=None)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signature — one groupBy, xxhash64-based."""
    sh = word_shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("id").agg(*mins)
    return wide.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash; optionally verified with
    exact shingle Jaccard on the candidates ONLY (the cheap-then-exact
    pattern): shingles are left-semi-joined to candidate ids before the
    verify pair join, so the exact pass costs O(candidate docs), never the
    full-corpus quadratic join."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    right = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    sh = word_shingles(df, id_col, text_col, n)
    return _jaccard_pairs_over(sh, verify_threshold, candidates=cand)


def _token_hash(col, hasher: str):
    """(hash Column, n_bits) for a token column under the named hasher.

    - ``xxhash64`` (default): full 64 bits, fastest — the scale path.
    - ``md5``: top 15 hex chars of md5 = 60 bits, always non-negative. Chosen
      because it is SQL-PORTABLE: DuckDB reproduces it bit-exactly as
      ``('0x' || substr(md5(tok), 1, 15))::BIGINT``, which lets the q20/q35
      gates be hash-checked against an independent oracle (xxhash64 has no
      DuckDB equivalent). 60 bits so the value fits signed BIGINT in both
      engines with identical string representation.
    """
    if hasher == "xxhash64":
        return F.xxhash64(col), 64
    if hasher == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), 60
    raise ValueError(f"unknown hasher {hasher!r} (use 'xxhash64' or 'md5')")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, simhash: bigint, chunks: array<int>) SimHash over tokens —
    64-bit for the xxhash64 hasher, 60-bit for the SQL-portable md5 hasher.

    Per-bit weighted sums as n_bits conditional-sum aggregates in one pass;
    the four (n_bits/4)-wide chunks support banded Hamming-neighbour joins.
    """
    hcol, n_bits = _token_hash(F.col("tok"), hasher)
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .select("id", hcol.alias("h"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    wide = tok.groupBy("id").agg(*bit_sums)
    sim = None
    for i in range(n_bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    out = wide.select("id", sim.alias("simhash"))
    w = n_bits // 4
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), w * c).bitwiseAND(F.lit((1 << w) - 1)).cast("int")
            for c in range(4)
        ]
    )
    return out.select("id", "simhash", chunks.alias("chunks"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: Hamming <= 3 over 64 bits implies at least one of
    the four 16-bit chunks is EQUAL, so the candidate join is an equi-join
    on (band, chunk) — never all-pairs. Candidates are then filtered with
    the exact popcount of the XOR. ``max_hamming`` must be < 4 for the
    4-chunk pigeonhole to be lossless.
    """
    if max_hamming >= 4:
        raise ValueError("4-chunk banding is only lossless for max_hamming <= 3")
    s = simhash(df, id_col, text_col, hasher=hasher)
    exploded = s.select(
        "id", "simhash", F.posexplode("chunks").alias("band", "chunk")
    )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "band", "chunk"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "band", "chunk"
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df: int = 1000,
) -> DataFrame:
    """Document pairs with TF-IDF cosine similarity >= threshold — sparse
    lexical similarity with NO embeddings, via an inverted term index
    (the prefix-filtering family; a from-scratch extension, the reference
    has no similarity operator at all).

    tf = per-(doc, term) count; idf = ln(N / df) over distinct-doc term
    frequency; weight = tf·idf; cosine = Σ w_a·w_b / (‖a‖·‖b‖), computed
    by joining the index on term and aggregating per pair — a sparse dot
    product that touches only co-occurring terms, never a dense matmul.

    Scale design mirrors ``ngram_jaccard_pairs``: terms with document
    frequency > ``max_df`` are dropped BEFORE the pair join AND before
    the norms (stop-word guard against the quadratic fan-out of hot
    terms; the metric is cosine over the filtered term space — identical
    to true cosine when nothing is filtered, and the filtered terms are
    exactly the least-informative ones: idf ≈ 0 contributes ≈ nothing).
    Norms ride along via a window over ``id`` (bounded per-partition by
    a doc's term count), keeping the a/b branches ReuseExchange-identical.
    N (corpus size) is a scalar crossJoin of a 1-row aggregate, not a
    collected literal — no driver round-trip, plan stays resumable.
    """
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda t: F.length(t) > 1,
            )
        ).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") <= max_df)
    )
    weighted = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df_"))).alias("w"),
        )
    )
    normed = weighted.withColumn(
        "norm",
        F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("id"))),
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("w").alias("w_a"),
        F.col("norm").alias("norm_a"), "term",
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("w").alias("w_b"),
        F.col("norm").alias("norm_b"), "term",
    )
    return (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "norm_a", "norm_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.col("norm_a") * F.col("norm_b"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment(A⊆B) = |A∩B| / |A| — the metric
    that catches a document plus its truncation/excerpt, which Jaccard
    structurally under-scores (a 10%-length excerpt of a clean doc has
    containment 1.0 but Jaccard 0.1, sailing under any Jaccard
    threshold). Standard in training-data pipelines for prefix/suffix
    and quote dedup; a from-scratch extension (the reference dedups
    exact keys only).

    Emits (id_a, id_b, containment_a, containment_b) for pairs where
    EITHER direction >= threshold — both directions ride the same pair
    aggregate, no second join. Same scale shape as
    ``ngram_jaccard_pairs``: inverted shingle index, max_df stop-shingle
    guard applied before the join AND the sizes (the metric is
    containment over the filtered space), window-carried sizes keeping
    the a/b branches ReuseExchange-identical.
    """
    sh = word_shingles(df, id_col, text_col, n)
    low_df = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") <= max_df)
        .select("shingle")
    )
    filtered = sh.join(low_df, "shingle", "left_semi")
    sized = filtered.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("id"))
    )
    a = sized.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = sized.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "id_a",
            "id_b",
            (F.col("n_common") / F.col("n_a")).cast("double").alias("containment_a"),
            (F.col("n_common") / F.col("n_b")).cast("double").alias("containment_b"),
        )
        .where(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with an evaluation/benchmark corpus (the GPT-3/Llama-style
    8-to-13-gram overlap filter run before every pretraining mix; the
    reference has no analog — its dedup is exact-key only).

    Scale shape: the benchmark side is tiny relative to a 100-TB training
    corpus (an eval suite is ~1e5 docs), so its DISTINCT shingle set is
    broadcast and the training corpus streams map-side through a broadcast
    LEFT SEMI join — the only shuffle is the per-doc hit count, keyed on
    doc id, carrying (id) rows for matched shingles only. Training text is
    never shuffled. For benchmark suites too large to broadcast, drop the
    ``broadcast`` hint and the same plan runs as a shuffled semi-join.

    Returns (doc_id, n_contaminated_shingles) for contaminated docs only —
    the count is of DISTINCT shared n-grams (word_shingles dedupes per doc).
    """
    bench_sh = (
        word_shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    )
    train_sh = word_shingles(df, id_col, text_col, n)
    hits = train_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
    return (
        hits.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
        .select(F.col("id").alias(id_col), "n_contaminated_shingles")
    )


def keep_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    quality: Column,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Dedup EXECUTION: one survivor per cluster — argmax ``quality``
    (evaluated over the doc columns), smallest-id tie-break — and the rest
    drop. The step after detection/clustering that actually shrinks a
    training corpus, keeping the best copy (longest text, highest quality
    score, ...) rather than an arbitrary min-id one.

    Returns (survivors, winners): survivors = docs rows that remain;
    winners = one narrow row per cluster (cluster_id, keep_id,
    cluster_size) for lineage. Docs ABSENT from the cluster map survive as
    their own singleton clusters (cluster_id = own id via coalesce after a
    left join) — a fingerprint relation that drops rows (NULL text, short
    docs) must never cause keep_canonical to delete unique documents. A
    synthetic singleton label can't collide with a real cluster label: a
    real cluster labeled X contains X, so X would be mapped, not synthetic.

    Plan: one left join of docs with the narrow cluster map
    (co-partitionable on id), one min_by aggregate per cluster (single
    shuffle — the struct(-quality, id) ordering makes the tie-break part
    of the same reduction, q43's min_by/max_by idiom: minimal NEGATED
    quality = maximal quality, then minimal id — the negation lives on
    the numeric quality, never on the id, so string ids work (negating a
    string id would cast-fail under ANSI); ``quality`` must be numeric.
    Then a semi-join back. winners is one row per cluster — O(distinct
    docs) once singletons are counted, so it is NOT broadcast-hinted (a
    100M-doc corpus would blow the broadcast limit); AQE picks the join
    strategy.
    """
    cmap = clusters.select(F.col("id").alias(id_col), "cluster_id")
    j = docs.join(cmap, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    winners = j.groupBy("cluster_id").agg(
        F.min_by(
            F.col(id_col),
            F.struct((-quality).alias("neg_q"), F.col(id_col).alias("id")),
        ).alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    survivors = docs.join(
        winners.select(F.col("keep_id").alias(id_col)),
        id_col,
        "left_semi",
    )
    return survivors, winners


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Cross-document line dedup (C4-style boilerplate removal): every
    line keeps exactly ONE occurrence corpus-wide — the (smallest doc id,
    smallest line number) one — and loses all others; lines shorter than
    ``min_line_chars`` are exempt (blank separators and one-word lines
    are structure, not boilerplate). Returns (id, text_out, n_lines_kept,
    n_lines_removed); documents whose every line was owned elsewhere
    disappear (the C4 empty-doc drop).

    Shape: posexplode → ONE window keyed on the line text itself (the row
    carries the line for reassembly anyway, so hashing the key would
    shuffle the same bytes and add collision risk for zero savings) picks
    the min-(id, line_no) owner; survivors re-assemble with ONE
    groupBy(id) whose collect_list buffer is bounded by a single
    document's line count. Two shuffles total, no joins, no driver state.
    """
    ln = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    w = Window.partitionBy("line")
    owner = F.min(F.struct(id_col, "line_no")).over(w)
    keep = (F.length("line") < min_line_chars) | (
        F.struct(F.col(id_col), F.col("line_no")) == owner
    )
    kept = ln.select(
        id_col, "line_no", "line", keep.alias("__keep")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_out"),
            F.sum(F.col("__keep").cast("long")).alias("n_lines_kept"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_lines_removed"),
        )
        .where(F.col("n_lines_kept") > 0)
        .select(id_col, "text_out", "n_lines_kept", "n_lines_removed")
    )
