"""Validation-metrics history + run-over-run anomaly detection.

The reference persists per-runtime stats rows and flags an incident when the
current value exceeds the trailing mean + sigma*stddev over a lookback
window per target (src/baskerville/models/incident_detector.py:251-295 —
the baseline SQL at 264-275 computes AVG/STDDEV over the trailing window).
This module restates that discipline over the VALIDATION ENGINE'S OWN
metrics: every run appends narrow
``(run_id, part_id, column_name, metric_name, metric_value)`` rows — melted
from ``column_stats`` output by :func:`metric_history_rows` — to a history
table, and :func:`detect_metric_anomalies` flags any run whose metric
deviates from its own trailing history by a k-sigma band or a
relative-change bound.  This is the metrics-repository + anomaly-detection
architecture Deequ popularized (repository of per-run analyzer metrics,
anomaly strategies over the metric time series), re-expressed as one narrow
window pass — and it catches the failure class the per-run checks
structurally cannot: a run that passes every ABSOLUTE threshold while its
metrics silently drift run-over-run (row count quietly halving, distinct
cardinality exploding, null-rate creeping).

Scale: the history table is O(runs x partitions x columns x metrics) — a
few KB per run even when the validated table holds 10^12 rows — and
detection never touches the fact table, only this narrow history: ONE
shuffle on the (part, column, metric) key, trailing stats via a rowsBetween
window (no self-join, no rescan of settled data).  The expensive part
(scanning the data) already happened exactly once, inside the run that
emitted the metrics; history rows ride the same checkpoint manifest as the
verdicts (runtime/manifest.py), so a resumed run appends only the
partitions it actually validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: metrics melted out of a ``column_stats`` row, all cast to double so the
#: history table has ONE value column regardless of the source metric type.
HISTORY_METRICS = ("count", "null_rate", "approx_distinct", "min", "max")

STDDEV_FLOOR = 1e-9


def metric_history_rows(stats: DataFrame, run_id: int) -> DataFrame:
    """Melt ``column_stats`` long-format output into narrow history rows.

    Input: the ``column_stats`` frame (part_id, column_name, count,
    null_count, min, max, approx_distinct, quantiles).  Output: one row per
    (part_id, column_name, metric) with columns
    ``run_id, part_id, column_name, metric_name, metric_value`` — null_rate
    is derived as ``null_count / (count + null_count)`` (0 on empty), min /
    max rows are emitted only for numeric source columns (they are NULL in
    the stats frame otherwise and NULL history rows are dropped: a metric
    that does not exist is not a zero).  Pure projection + explode — no new
    shuffle beyond the one ``column_stats`` already paid.
    """
    total = F.col("count") + F.col("null_count")
    null_rate = F.when(total > 0, F.col("null_count") / total).otherwise(F.lit(0.0))
    metrics = F.array(
        F.struct(F.lit("count").alias("metric_name"),
                 F.col("count").cast("double").alias("metric_value")),
        F.struct(F.lit("null_rate").alias("metric_name"),
                 null_rate.cast("double").alias("metric_value")),
        F.struct(F.lit("approx_distinct").alias("metric_name"),
                 F.col("approx_distinct").cast("double").alias("metric_value")),
        F.struct(F.lit("min").alias("metric_name"),
                 F.col("min").cast("double").alias("metric_value")),
        F.struct(F.lit("max").alias("metric_name"),
                 F.col("max").cast("double").alias("metric_value")),
    )
    return (
        stats.select(
            F.lit(int(run_id)).cast("long").alias("run_id"),
            "part_id",
            "column_name",
            F.explode(metrics).alias("m"),
        )
        .select("run_id", "part_id", "column_name", "m.metric_name", "m.metric_value")
        .where(F.col("metric_value").isNotNull())
    )


def detect_metric_anomalies(
    history: DataFrame,
    k_sigma: float = 3.0,
    rel_change_max: float = 0.5,
    min_history: int = 3,
    lookback: int | None = None,
    current_run_id: int | None = None,
) -> DataFrame:
    """Flag metric values that break from their own trailing history.

    For every (part_id, column_name, metric_name) series ordered by run_id,
    each row is compared against the runs STRICTLY BEFORE it (``rowsBetween``
    ending at -1 — the current value never contaminates its own baseline;
    ``lookback=N`` bounds the frame to the last N runs, the reference's
    fixed trailing window, else all prior runs):

    - **k-sigma band** (the reference's incident rule):
      ``|value - trailing_mean| > k_sigma * max(trailing_stddev, floor)``
    - **relative-change bound** (catches the flat-history case where stddev
      is ~0 and any jump is infinite sigmas — and gives a meaningful rule
      for the first runs after ``min_history``):
      ``|value - trailing_mean| > rel_change_max * max(|trailing_mean|, floor)``

    A row is an anomaly when EITHER rule fires and at least ``min_history``
    prior runs exist (fewer ⇒ ``anomaly`` is false and trailing columns are
    still reported, so callers can audit warm-up runs).  Returns the history
    columns plus ``trailing_n, trailing_mean, trailing_stddev, z_score,
    rel_change, anomaly``; ``current_run_id`` filters the output to one
    run's report without changing any computation.

    One shuffle total (window partition key), rows are O(metrics), never
    O(data).
    """
    lo = Window.unboundedPreceding if lookback is None else -int(lookback)
    w = (
        Window.partitionBy("part_id", "column_name", "metric_name")
        .orderBy("run_id")
        .rowsBetween(lo, -1)
    )
    v = F.col("metric_value")
    mean = F.avg(v).over(w)
    # stddev_samp of a single prior row is NULL — coalesce to 0 so the
    # k-sigma rule degenerates to the floor (rel-change rule still governs).
    std = F.coalesce(F.stddev_samp(v).over(w), F.lit(0.0))
    n = F.count(v).over(w)
    std_eff = F.greatest(std, F.lit(STDDEV_FLOOR))
    mean_eff = F.greatest(F.abs(mean), F.lit(STDDEV_FLOOR))
    z = (v - mean) / std_eff
    rel = (v - mean) / mean_eff
    out = history.select(
        "*",
        n.alias("trailing_n"),
        mean.alias("trailing_mean"),
        std.alias("trailing_stddev"),
        z.alias("z_score"),
        rel.alias("rel_change"),
        (
            (n >= int(min_history))
            & ((F.abs(v - mean) > float(k_sigma) * std_eff)
               | (F.abs(v - mean) > float(rel_change_max) * mean_eff))
        ).alias("anomaly"),
    )
    if current_run_id is not None:
        out = out.where(F.col("run_id") == int(current_run_id))
    return out
