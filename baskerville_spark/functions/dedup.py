"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the whole point of these over naive pairwise):
- **exact**: hash-groupBy on md5(text) — never shuffles the text itself,
  only (hash, id). Salted two-phase like checks/uniqueness.py when a
  pathological duplicate explodes one key.
- **n-gram Jaccard**: inverted-index self-join on shingles. The classic
  quadratic blowup is bounded by dropping shingles with document frequency
  > max_df (a stop-shingle filter) — standard trick; without it one common
  shingle joins the whole corpus to itself.
- **MinHash+LSH**: k hash functions h_i(s) = xxhash64(i || shingle), min per
  doc per i → signature; band hashes → bucket join → candidates; verified
  with exact Jaccard on candidates only. All hashing via the built-in
  xxhash64 — zero Python.
- **SimHash**: 64 per-bit conditional sums over token hashes in ONE
  groupBy.agg — wide but JVM-side; near-dup candidates via band equality on
  16-bit chunks (Hamming ≤ 3 ⇒ at least one of 4 chunks equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, ids)."""
    hashed = df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
    return (
        hashed.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.sort_array(F.collect_list("id")).alias("ids"))
        .where(F.col("dup_count") > 1)
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
    document frequency > max_df are dropped (stop-shingle guard against the
    quadratic join blowup at corpus scale).
    """
    sh = word_shingles(df, id_col, text_col, n)
    doc_sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    filtered = sh.join(
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).where(F.col("df_") <= max_df),
        "shingle",
    )
    a = filtered.select(F.col("id").alias("id_a"), "shingle")
    b = filtered.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = doc_sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = doc_sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("double").alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


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
    exact shingle Jaccard (candidates only — the cheap-then-exact pattern)."""
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
    verified = ngram_jaccard_pairs(df, id_col, text_col, n, verify_threshold, max_df=1 << 30)
    return cand.join(verified, ["id_a", "id_b"])


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: bigint, chunks: array<int>) 64-bit SimHash over tokens.

    Per-bit weighted sums as 64 conditional-sum aggregates in one pass; the
    four 16-bit chunks support banded Hamming-neighbour joins.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .select("id", F.xxhash64("tok").alias("h"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    wide = tok.groupBy("id").agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    out = wide.select("id", sim.alias("simhash"))
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).cast("int")
            for c in range(4)
        ]
    )
    return out.select("id", "simhash", chunks.alias("chunks"))
