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
