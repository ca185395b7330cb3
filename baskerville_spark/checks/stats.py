"""Per-partition column statistics in ONE aggregation pass.

Replaces the reference's per-feature agg-dict composition
(src/baskerville/models/base_spark.py:209-250 + groupBy funnel at 445-458)
with a single ``groupBy(part_id).agg(...)`` whose expressions are all
JVM-side built-ins:

- count / null_count          → F.count / F.sum(isnull)    (feature_request_total.py:25-27 analog)
- min / max                   → F.min / F.max              (base_feature.py:113-116 analog)
- approx_distinct             → approx_count_distinct (HLL++) — the scale-safe
  replacement of the reference's exact F.countDistinct
  (features/feature_unique_ua_total.py:28); the north rule mandates HLL at 10^12.
- quantiles                   → percentile_approx (KLL-style sketch)

Scale: one shuffle keyed on part_id; partial aggregation (map-side combine)
applies to every expression, including the HLL and quantile sketches, so the
reduce side sees one sketch per (partition, column) — no collect_list-style
scale traps (cf. reference fallback agg base_spark.py:236-239).
The long-format output is produced by exploding an array<struct> built from
the wide agg row — stays inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _aggs_for(col: str, numeric: bool, quantiles: list[float], rsd: float) -> list[Column]:
    c = F.col(col)
    aggs = [
        F.count(c).alias(f"{col}__count"),
        F.sum(F.isnull(c).cast("long")).alias(f"{col}__null_count"),
        F.approx_count_distinct(c, rsd).alias(f"{col}__approx_distinct"),
    ]
    if numeric:
        aggs += [
            F.min(c).cast("double").alias(f"{col}__min"),
            F.max(c).cast("double").alias(f"{col}__max"),
            F.percentile_approx(c.cast("double"), quantiles).alias(f"{col}__quantiles"),
        ]
    return aggs


def column_stats(
    df: DataFrame,
    part_col: str | None = "part_id",
    numeric_cols: list[str] | None = None,
    other_cols: list[str] | None = None,
    quantiles: list[float] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """Long-format per-(partition, column) stats: one shuffle total.

    Returns columns: part_id, column_name, count, null_count, min, max,
    approx_distinct, quantiles (array<double>, numeric cols only).
    ``part_col=None`` computes whole-table stats (part_id = 0).
    """
    quantiles = quantiles or DEFAULT_QUANTILES
    if part_col is None:
        df = df.withColumn("__whole_table", F.lit(0))
        part_col = "__whole_table"
    if numeric_cols is None or other_cols is None:
        numeric_types = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}
        inferred_num, inferred_other = [], []
        for name, dtype in df.dtypes:
            if name == part_col:
                continue
            base = dtype.split("(")[0]
            (inferred_num if base in numeric_types else inferred_other).append(name)
        numeric_cols = numeric_cols if numeric_cols is not None else inferred_num
        other_cols = other_cols if other_cols is not None else inferred_other

    aggs: list[Column] = []
    for c in numeric_cols:
        aggs += _aggs_for(c, True, quantiles, rsd)
    for c in other_cols:
        aggs += _aggs_for(c, False, quantiles, rsd)

    wide = df.groupBy(F.col(part_col).alias("part_id")).agg(*aggs)

    structs = []
    for c in numeric_cols + other_cols:
        numeric = c in numeric_cols
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__count").alias("count"),
                F.col(f"{c}__null_count").alias("null_count"),
                (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias("min"),
                (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias("max"),
                F.col(f"{c}__approx_distinct").alias("approx_distinct"),
                (
                    F.col(f"{c}__quantiles")
                    if numeric
                    else F.lit(None).cast("array<double>")
                ).alias("quantiles"),
            )
        )

    return (
        wide.select("part_id", F.explode(F.array(*structs)).alias("s"))
        .select("part_id", "s.*")
    )


def stats_verdicts(
    stats: DataFrame,
    null_rate_max: float = 0.05,
    range_bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Threshold stats into verdict rows (reference threshold-verdict shape,
    src/baskerville/models/pipeline_tasks/tasks.py:1784-1794).

    Emits one row per (part_id, check, column): null_rate check always;
    range check for columns with declared bounds.

    Structurally a SINGLE pass over ``stats``: every check row comes out of
    one explode(array_compact(...)) — not a union of a null-rate branch plus
    one filtered branch per bounded column. The union form re-executes the
    whole stats subtree (the one-shuffle aggregate over the fact table) once
    per branch whenever ``stats`` is not cached, because filter/column
    pruning specialize each branch's aggregate and defeat ReuseExchange
    (same pathology as drift_verdicts' old union — see docs/PLANS.md).
    """
    n_total = F.col("count") + F.col("null_count")
    null_rate = (F.col("null_count") / F.greatest(n_total, F.lit(1))).cast("double")
    pieces = [
        F.struct(
            F.concat(F.lit("null_rate:"), F.col("column_name")).alias("check_name"),
            (null_rate <= null_rate_max).alias("passed"),
            null_rate.alias("metric_value"),
            F.lit(null_rate_max).alias("threshold"),
            n_total.alias("n_rows"),
            F.col("null_count").alias("n_violations"),
        )
    ]
    for col, (lo, hi) in (range_bounds or {}).items():
        pieces.append(
            # struct-or-NULL; array_compact drops the NULLs so the range
            # verdict only materializes on the matching column's stats row
            F.when(
                F.col("column_name") == col,
                F.struct(
                    F.concat(F.lit("range:"), F.col("column_name")).alias("check_name"),
                    # coalesce: an all-NULL partition has NULL min/max →
                    # vacuous pass (the null-rate check flags it), never a
                    # NULL verdict a boolean filter downstream silently drops
                    F.coalesce(
                        (F.col("min") >= lo) & (F.col("max") <= hi), F.lit(True)
                    ).alias("passed"),
                    F.col("max").alias("metric_value"),
                    F.lit(float(hi)).alias("threshold"),
                    n_total.alias("n_rows"),
                    F.lit(None).cast("long").alias("n_violations"),
                ),
            )
        )
    return stats.select(
        "part_id", F.explode(F.array_compact(F.array(*pieces))).alias("__v")
    ).select("part_id", "__v.*")


def robust_outlier_violations(
    df: DataFrame,
    value_col: str,
    part_col: str = "part_id",
    id_cols: list[str] | None = None,
    k: float = 5.0,
) -> DataFrame:
    """Median/MAD robust outlier flagging per partition:
    ``|x − median| > k · 1.4826 · MAD`` (1.4826 scales MAD to σ under
    normality — the robust z-score). Mean/stddev-based thresholds (the
    reference's incident condition, incident_detector.py:285-289) are
    dragged by the very outliers they hunt; median/MAD has a 50%
    breakdown point.

    Plan: TWO aggregate passes (median, then MAD of |x−med|), each
    producing one tiny per-partition row broadcast back — the flag itself
    is a map-side filter, no row-level shuffle. Uses the EXACT
    ``percentile`` (DuckDB quantile_cont parity; it buffers each group's
    values, fine at gate scale) — at 10^12 rows swap ``percentile_approx``,
    whose rank-error bound is exactly what the q46 sketch-accuracy gate
    certifies.
    """
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(
        F.col(part_col).alias("__part"),
        *[F.col(c) for c in (id_cols or [])],
        v.alias("__x"),
    )
    med = base.groupBy("__part").agg(F.percentile(F.col("__x"), 0.5).alias("med"))
    with_med = base.join(F.broadcast(med), "__part")
    mad = with_med.groupBy("__part").agg(
        F.percentile(F.abs(F.col("__x") - F.col("med")), 0.5).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), "__part")
        .where(
            F.abs(F.col("__x") - F.col("med"))
            > F.lit(k) * F.lit(1.4826) * F.greatest(F.col("mad"), F.lit(1e-12))
        )
        .select(
            F.col("__part").alias(part_col),
            *[F.col(c) for c in (id_cols or [])],
            F.col("__x").alias(value_col),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """Benford first-significant-digit analysis of a numeric column: one
    row per digit 1..9 with observed count/fraction, the Benford
    expectation log10(1 + 1/d), and the absolute deviation. Fabricated or
    template-generated numeric columns (synthetic payments, copy-pasted
    measurements, unit-mangled durations) break the Benford curve long
    before their mean/stddev look wrong — the classic forensic screen,
    applicable when the column spans several orders of magnitude.

    The digit is extracted as the first [1-9] character of the value's
    string form — correct in plain AND scientific notation ('0.00123',
    '1.23E7', '-9.9e-5' all yield the right digit), sign-blind, and NULL
    for 0/NaN/Inf (excluded with n accounting). The numeric alternative,
    floor(x / 10^floor(log10 x)), returns digit 10 whenever log10 lands
    an ulp low on a power of ten — the string path has no such edge.

    Scale: ONE full-data pass (regexp + groupBy on a 9-value key); the
    digit frame is a literal 9-row join. Zero-observation digits still
    emit their row (a digit with expectation 30% and count 0 is the
    strongest possible signal — it must not vanish from the report).
    """
    digit = F.regexp_extract(F.col(col).cast("string"), "[1-9]", 0)
    counts = (
        df.where(F.col(col).isNotNull() & (digit != ""))
        .groupBy(digit.cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    # persist the 9-row frame: the total and the output both derive from
    # it — unpersisted, each branch is a separate full scan of the table
    full = digits.join(counts, "digit", "left").na.fill({"n_d": 0}).persist()
    total = full.agg(F.sum("n_d").alias("n_total"))
    out = full.crossJoin(F.broadcast(total))
    obs = F.col("n_d") / F.greatest(F.col("n_total"), F.lit(1))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return out.select(
        "digit",
        F.col("n_d").cast("long").alias("n_d"),
        obs.cast("double").alias("obs_frac"),
        exp.alias("exp_frac"),
        F.abs(obs - exp).cast("double").alias("abs_dev"),
    )
