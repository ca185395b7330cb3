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
