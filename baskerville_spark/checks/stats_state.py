"""Mergeable column-stats state: validate appends without rescanning.

The reference recomputes its request-set statistics from scratch every
pipeline run (src/baskerville/models/base_spark.py:445-458 — the feature
funnel always aggregates the full window); at 10^12 rows a full rescan per
appended Iceberg snapshot is the dominant cost. This module makes the stats
layer INCREMENTAL the Spark-first way: every aggregate the validation suite
needs is kept in a *mergeable state row* per (group × ingest batch) —

- count / null-count / min / max / sum: trivially mergeable scalars,
- approx-distinct: a DataSketches HLL sketch (``hll_sketch_agg``), whose
  union (``hll_union_agg``) is register-wise max — so merging per-batch
  sketches yields BIT-IDENTICAL estimates to a single pass over the union
  (max is associative/commutative/idempotent; asserted in tests).

Workflow: ``stats_state(new_batch)`` scans ONLY the new partitions (one
pass, one exchange), the tiny state rows are appended to a state table, and
``merge_stats_states`` folds any set of state rows into current table-level
stats — never touching settled data. A killed backfill resumes by merging
whatever states were committed (the manifest pattern, runtime/manifest.py).

Caveats stated where they bite: double-typed sums are floating-point and
order-dependent, so cross-run equality is only exact for integral columns
(the gate and tests use bigint); estimates come from sketches and must be
consumed through verdicts with margins >> rsd (1.04/sqrt(2^lg_k); 0.81% at
the default lg_k=14), the same discipline as checks/suite.approx_distinct.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stats_state", "merge_stats_states", "finalize_stats"]

DEFAULT_LG_K = 14


def stats_state(
    df: DataFrame,
    group_by: Sequence[str],
    numeric_cols: Sequence[str],
    distinct_cols: Sequence[str] = (),
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One pass over ``df`` -> one mergeable state row per group.

    Columns: n_rows, then per numeric col ``{c}_n/_nulls/_min/_max/_sum``
    (sum keeps the input's integral/floating class), per distinct col
    ``{c}_hll`` (binary sketch). All partials combine map-side; the
    exchange carries one row per (group × task).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}_n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}_nulls"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            F.sum(col).alias(f"{c}_sum"),
        ]
    for c in distinct_cols:
        aggs.append(F.hll_sketch_agg(c, lg_k).alias(f"{c}_hll"))
    return df.groupBy(*group_by).agg(*aggs)


def merge_stats_states(
    states: DataFrame,
    group_by: Sequence[str],
    numeric_cols: Sequence[str],
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold state rows (same schema as ``stats_state`` output, any number
    of batches unioned together) into one state row per group. Merging is
    exact for counts/min/max/integral sums and register-max for sketches —
    ``merge(state(A), state(B)) == state(A ∪ B)`` field-for-field when A
    and B are disjoint batches (asserted in tests/test_checks.py)."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in numeric_cols:
        aggs += [
            F.sum(f"{c}_n").alias(f"{c}_n"),
            F.sum(f"{c}_nulls").alias(f"{c}_nulls"),
            F.min(f"{c}_min").alias(f"{c}_min"),
            F.max(f"{c}_max").alias(f"{c}_max"),
            F.sum(f"{c}_sum").alias(f"{c}_sum"),
        ]
    for c in distinct_cols:
        # lg_k is fixed per state table (DEFAULT_LG_K); differing sketches
        # would silently degrade to the smaller k, so forbid them.
        aggs.append(
            F.hll_union_agg(f"{c}_hll", False).alias(f"{c}_hll")
        )
    return states.groupBy(*group_by).agg(*aggs)


def finalize_stats(
    state: DataFrame,
    distinct_cols: Sequence[str] = (),
    drop_sketches: bool = True,
) -> DataFrame:
    """Render consumable stats from a state row: adds
    ``{c}_distinct_est`` (long) per distinct col and drops the binary
    sketches (keep them with ``drop_sketches=False`` to continue merging)."""
    out = state
    for c in distinct_cols:
        out = out.withColumn(
            f"{c}_distinct_est", F.hll_sketch_estimate(f"{c}_hll")
        )
    if drop_sketches:
        out = out.drop(*[f"{c}_hll" for c in distinct_cols])
    return out
