"""Deterministic hash-threshold sampling — the shared keep-predicate.

The q28 stratified-sampling trick generalized: an md5 bucket of the id is
uniform over [0, 1e6) and independent of any structure the ids encode
(unlike ``id % k``, which biases the sample whenever ids encode cluster or
partition membership), so ``bucket < frac*1e6`` keeps a deterministic,
reproducible ~``frac`` of the rows with no RNG and no extra shuffle.

Single source of truth for the expression: ``ml/iforest.training_sample``
and ``functions/similarity.ivf_training_sample`` both build their HARD-
capped driver samples from this predicate (cap = 0.9-headroom threshold +
``limit`` backstop); keeping one copy means their documented "same bound
contract" cannot silently diverge (round-4 review).

Reference seam: the reference samples with seeded ``F.rand`` / ``sampleBy``
(spark/helpers.py:232-234, tasks.py:1493-1499) — engine-private draws the
DuckDB oracle cannot replay; the hash threshold is the oracle-checkable
equivalent (q28, q38, q55 all ride it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bucket space for the keep threshold; 1e6 gives ppm granularity
N_BUCKETS = 1_000_000


def hash_bucket(id_expr: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from an id column:
    md5 → first 15 hex digits (60 bits, within bigint) → pmod."""
    return F.pmod(
        F.conv(F.substring(F.md5(id_expr.cast("string")), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(n_buckets),
    )


def hash_threshold_keep(id_expr: Column, frac: float) -> Column:
    """Keep-predicate selecting ~``frac`` of rows deterministically.

    The +1 rounds the threshold UP so frac>0 never selects zero buckets;
    callers that must bound the absolute sample size add their own
    ``limit`` backstop after this filter.
    """
    return hash_bucket(id_expr) < F.lit(int(frac * N_BUCKETS) + 1)


def mixture_sample(
    df,
    target_weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
):
    """Downsample to a target group mixture WITHOUT upsampling — the
    pretraining domain-rebalancing pass (e.g. "make the mix 40% web /
    25% books / ..."): find the largest total T achievable given each
    group's population (T = min_g n_g / w_g), then keep each group at
    rate_g = w_g * T / n_g via the deterministic hash-threshold predicate.

    Scale: ONE tiny groupBy(group) count (the only shuffle; group
    cardinality ~ dozens of domains), rates computed driver-side from
    those few rows, then a pure map-side filter over the corpus — no
    second shuffle, no RNG, reproducible across engines and
    partitionings. Groups absent from ``target_weights`` are dropped
    (their target share is zero).
    """
    from pyspark.sql import functions as F

    counts = {
        r[0]: r[1] for r in df.groupBy(group_col).count().collect()
    }
    present = {g: w for g, w in target_weights.items() if counts.get(g)}
    if not present:
        raise ValueError("no target group present in the data")
    total = min(counts[g] / w for g, w in present.items())
    thr_map = {
        g: int(((w * total) / counts[g]) * N_BUCKETS) + 1
        for g, w in present.items()
    }
    thr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(thr_map.items()) for x in kv]),
        F.col(group_col),
    )
    return df.where(hash_bucket(F.col(id_col)) < thr)


def train_val_test_split(
    id_col: str = "doc_id",
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    n_buckets: int = 1000,
) -> Column:
    """Split-assignment column: deterministic, engine-portable (the md5
    hash_bucket variate), disjoint and exhaustive by construction —
    cumulative bucket thresholds carve [0, n_buckets) into one interval
    per split. A pure map-side expression over the id column alone (no
    DataFrame parameter — nothing else feeds the assignment): no shuffle,
    no state, stable across runs/partitionings/engines, so a doc can
    never leak between train and eval splits when the corpus is
    re-processed. Cumulative thresholds must be strictly increasing —
    a nonzero frac that rounds to an empty bucket interval (frac <
    ~0.5/n_buckets) is an error, not a silent empty split; raise
    n_buckets instead."""
    if len(fracs) != len(names) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fracs must match names and sum to 1")
    thresholds = []
    cum = 0.0
    for frac in fracs[:-1]:
        cum += frac
        thresholds.append(int(round(cum * n_buckets)))
    if any(
        t2 <= t1 for t1, t2 in zip([0] + thresholds, thresholds + [n_buckets])
    ):
        raise ValueError(
            f"thresholds {thresholds} of {n_buckets} not strictly increasing: "
            "some split would be empty; raise n_buckets"
        )
    if not thresholds:  # single split: everything gets the one name
        return F.lit(names[-1]).alias("split")
    b = hash_bucket(F.col(id_col), n_buckets)
    expr = F.when(b < F.lit(thresholds[0]), F.lit(names[0]))
    for thr, name in zip(thresholds[1:], names[1:-1]):
        expr = expr.when(b < F.lit(thr), F.lit(name))
    return expr.otherwise(F.lit(names[-1])).alias("split")


def select_within_token_budget(
    df,
    id_col: str,
    tokens_col: str,
    budget: int,
    priority_col: str,
):
    """Greedy prefix selection under a global token budget: order the
    corpus by ``(priority_col ASC, id_col ASC)`` (deterministic — ties
    broken by id) and mark each document ``selected`` while the running
    token total stays within ``budget`` (standard training-mix
    composition: "the best documents up to N tokens"; pass a quality
    score, a sampling hash like md5(id) for an unbiased shuffle, or a
    domain weight as the priority).

    Output: every input row with ``cum_tokens`` (running total INCLUDING
    the row, exact bigint) and ``selected`` (cum_tokens <= budget — the
    greedy prefix, never a partially-counted document).

    Scale: the global running sum is the packing.py two-phase form —
    ONE job over a range exchange on the (priority, id) sort key collects
    per-block token totals and per-block max sort keys; block membership
    of the returned frame is then a deterministic function of the row's
    own key compared against the collected COMPOSITE bounds (struct
    comparison in Column algebra), so the returned plan never re-runs a
    possibly differently-sampled range exchange. The only per-row state
    is a within-block window cumsum — no single-task global window, no
    driver-side data beyond P (parallelism) bound rows.
    """
    from pyspark.sql import Window

    base = df.withColumn("__pri", F.col(priority_col)).withColumn(
        "__tok", F.col(tokens_col).cast("long")
    )
    n_blocks = base.sparkSession.sparkContext.defaultParallelism
    ranged = base.repartitionByRange(
        n_blocks, F.col("__pri").asc(), F.col(id_col).asc()
    ).withColumn("__block", F.spark_partition_id())
    stats = sorted(
        ranged.groupBy("__block")
        .agg(
            F.sum("__tok").alias("t"),
            F.max(F.struct(F.col("__pri"), F.col(id_col).alias("__id"))).alias(
                "mx"
            ),
        )
        .collect(),
        key=lambda r: r["__block"],
    )
    offsets: list[int] = []
    acc = 0
    for r in stats:
        offsets.append(acc)
        acc += int(r["t"] or 0)
    bounds = [r["mx"] for r in stats[:-1]]
    if bounds:
        barr = F.array(
            *[
                F.struct(
                    F.lit(b["__pri"]).alias("__pri"),
                    F.lit(b["__id"]).alias("__id"),
                )
                for b in bounds
            ]
        )
        row_key = F.struct(
            F.col("__pri").alias("__pri"), F.col(id_col).alias("__id")
        )
        # structs compare lexicographically: #bounds strictly below this
        # row's key IS its block index (same law as packing.py's scalar
        # bounds, lifted to the composite sort key)
        block = F.size(F.filter(barr, lambda b: b < row_key))
    else:
        block = F.lit(0)
    off = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for i, o in enumerate(offsets) for x in (i, o)]
            ),
            block,
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("__block")
        .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        base.withColumn("__block", block)
        .withColumn(
            "cum_tokens", (off + F.sum("__tok").over(w)).cast("long")
        )
        .withColumn("selected", F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("__pri", "__tok", "__block")
    )
    return out
