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

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stats_state",
    "merge_stats_states",
    "finalize_stats",
    "histogram_state",
    "merge_histogram_states",
    "histogram_quantile_bounds",
    "histogram_psi",
    "histogram_ks",
]

DEFAULT_LG_K = 14


def stats_state(
    df: DataFrame,
    group_by: Sequence[str],
    numeric_cols: Sequence[str],
    distinct_cols: Sequence[str] = (),
    lg_k: int = DEFAULT_LG_K,
    hist_cols: Optional[Mapping[str, Sequence[float]]] = None,
) -> DataFrame:
    """One pass over ``df`` -> one mergeable state row per group.

    Columns: n_rows, then per numeric col ``{c}_n/_nulls/_min/_max/_sum``
    (sum keeps the input's integral/floating class), per distinct col
    ``{c}_hll`` (binary sketch), per hist col ``{c}_hist`` (exact bin
    counts — see histogram_state). All partials combine map-side; the
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
    for c, edges in (hist_cols or {}).items():
        aggs.append(_hist_counts(c, edges).alias(f"{c}_hist"))
    return df.groupBy(*group_by).agg(*aggs)


def merge_stats_states(
    states: DataFrame,
    group_by: Sequence[str],
    numeric_cols: Sequence[str],
    distinct_cols: Sequence[str] = (),
    hist_cols: Optional[Mapping[str, Sequence[float]]] = None,
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
    for c, edges in (hist_cols or {}).items():
        aggs.append(_hist_merge(f"{c}_hist", len(edges) + 1))
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


# --------------------------------------------------------------------------
# Mergeable histogram state: exact binned distributions that fold by
# element-wise sum. The north rule names KLL quantile sketches; with FIXED
# bin edges (the production shape — edges come from the baseline snapshot,
# checks/drift.capture_baseline) an exact count histogram is the *stronger*
# sketch: merging per-batch count arrays is bit-exact (long addition is
# associative/commutative), quantiles come back with a provable ±bin-width
# bound, and PSI drift is computed from the same state with zero rescans.
# Reference contrast: baskerville recomputes its feature histograms from the
# full window every run (src/baskerville/models/base_spark.py:445-458).
# --------------------------------------------------------------------------


def _hist_bucket(col: Column, inner_edges: Sequence[float]) -> Column:
    """bucket = #edges <= value — same convention as drift._bucket_expr
    (bin 0 = (-inf, e0), bin i = [e_{i-1}, e_i), last = [e_last, inf))."""
    b = F.lit(0)
    for e in inner_edges:
        b = b + (col >= F.lit(float(e))).cast("int")
    return b


def _hist_counts(c: str, edges: Sequence[float]) -> Column:
    """array<long> of len(edges)+1 exact bin counts as conditional SUMs
    (NULLs excluded — track them via stats_state's ``{c}_nulls``)."""
    inner = [float(e) for e in edges]
    b = _hist_bucket(F.col(c), inner)
    return F.array(*[
        F.sum((F.col(c).isNotNull() & (b == i)).cast("long"))
        for i in range(len(inner) + 1)
    ])


def _hist_merge(hist_col: str, nb: int) -> Column:
    zero = F.array_repeat(F.lit(0).cast("long"), nb)
    return F.aggregate(
        F.collect_list(hist_col),
        zero,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    ).alias(hist_col)


def histogram_state(
    df: DataFrame,
    group_by: Sequence[str],
    hist_cols: Mapping[str, Sequence[float]],
) -> DataFrame:
    """One pass -> one state row per group with ``{c}_hist`` bin counts.
    Every bin is a conditional SUM in the same single groupBy, so partials
    combine map-side and the exchange carries one state row per
    (group × task)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [
        _hist_counts(c, edges).alias(f"{c}_hist")
        for c, edges in hist_cols.items()
    ]
    return df.groupBy(*group_by).agg(*aggs)


def merge_histogram_states(
    states: DataFrame,
    group_by: Sequence[str],
    hist_cols: Mapping[str, Sequence[float]],
) -> DataFrame:
    """Fold histogram state rows: element-wise long sum per bin —
    ``merge(state(A), state(B)) == state(A ∪ B)`` BIT-EXACTLY for disjoint
    batches. collect_list order is nondeterministic but long addition is
    order-free, so the fold is deterministic; the list is bounded by the
    number of ingest batches per group (state rows, not data rows)."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    aggs += [
        _hist_merge(f"{c}_hist", len(edges) + 1)
        for c, edges in hist_cols.items()
    ]
    return states.groupBy(*group_by).agg(*aggs)


def _prefix_ge(counts: Column, target: Column) -> Column:
    """Smallest 1-based index whose left-fold prefix sum reaches ``target``
    (NULL if the whole array sums below it)."""
    idxs = F.filter(
        F.sequence(F.lit(1), F.size(counts)),
        lambda i: F.aggregate(
            F.slice(counts, F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ) >= target,
    )
    return F.element_at(idxs, F.lit(1))


def histogram_quantile_bounds(
    counts: Column, q: float, inner_edges: Sequence[float]
) -> tuple[Column, Column]:
    """(lo, hi) edge bounds bracketing the exact q-quantile of the data the
    histogram summarizes: the rank-ceil(q·n) element lands in bin k, whose
    edges bound every element in it. Exact integer arithmetic end-to-end
    (counts are exact longs; ceil(q·n) is exact for n < 2^52), so the
    bounds are deterministic and oracle-hashable; unbounded outer bins
    yield NULL on that side. Error is the bin width — the knob the caller
    owns via the baseline's edges."""
    total = F.aggregate(
        counts, F.lit(0).cast("long"), lambda a, x: a + x
    )
    target = F.greatest(
        F.ceil(F.lit(float(q)) * total).cast("long"), F.lit(1).cast("long")
    )
    k = _prefix_ge(counts, target)  # 1-based bin index
    edge_arr = F.array(*[F.lit(float(e)) for e in inner_edges])
    lo = F.when(k > 1, F.element_at(edge_arr, (k - 1).cast("int")))
    hi = F.when(
        k <= len(inner_edges), F.element_at(edge_arr, k.cast("int"))
    )
    return lo, hi


def _count_fracs(counts: Column) -> Column:
    total = F.aggregate(counts, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.transform(counts, lambda x: x / F.greatest(total, F.lit(1)))


def histogram_ks(
    cur_counts: Column, base_counts: Column, n_bins: int
) -> Column:
    """Binned two-sample KS between two histogram states: max over bin
    prefixes of |CDF_cur − CDF_base|, each CDF a left-fold prefix sum
    (checks/drift._cdf_at — the same fold order as every drift oracle).
    PSI's companion from the SAME state rows: PSI weights tail moves by
    log-ratio, KS catches bulk CDF shifts PSI's clamping mutes."""
    from baskerville_spark.checks.drift import _cdf_at

    cur, base = _count_fracs(cur_counts), _count_fracs(base_counts)
    diffs = [
        F.abs(_cdf_at(cur, i) - _cdf_at(base, i))
        for i in range(1, n_bins + 1)
    ]
    return F.greatest(*diffs) if len(diffs) > 1 else diffs[0]


def histogram_psi(cur_counts: Column, base_counts: Column) -> Column:
    """PSI between two histogram states (current vs baseline snapshot).
    Fractions = count/max(total,1) per side, then the ONE copy of the
    clamped PSI arithmetic (checks/drift._clamped_psi) — same fold order
    as every drift oracle."""
    from baskerville_spark.checks.drift import _clamped_psi

    return _clamped_psi(_count_fracs(cur_counts), _count_fracs(base_counts))
