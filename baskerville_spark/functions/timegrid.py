"""Gap-fill to a regular time grid (forward fill), explode-from-observation.

The time-series regularization step every monitoring/feature pipeline
needs upstream of drift/rolling ops (checks/drift.py consumes CONSECUTIVE
windows; a sensor that skips hours silently breaks "previous window"
semantics). Reference seam: Baskerville's incident detector assumes dense
2-minute buckets and has no fill story (incident_detector.py trailing
windows); this is a from-scratch extension.

Shape: the textbook form builds a per-key calendar table and left-joins
observations onto it — a second shuffle plus a grid materialization the
size of keys × slots. Here each OBSERVED row emits its own fill span
instead: ``lead(slot)`` over the key window finds the next observation,
``explode(sequence(slot, next-step, step))`` emits the carried rows — the
values are already ON the row, so forward fill needs no join, no grid
table, and no second exchange. One hash exchange on the keys serves both
the slot-collapse aggregate and the window (HashPartitioning on a prefix
of the grouping keys satisfies both distributions).

Row amplification is the hazard at scale: one observation before a
year-long gap at 1 s steps would emit 3×10^7 rows. ``max_fill`` caps the
span per gap (further slots stay ABSENT, which downstream rolling ops
read as "no data" — the honest answer); unbounded fill is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    keys: list[str],
    slot_col: str,
    value_cols: list[str],
    step: int,
    order_col: str,
    max_fill: int | None = None,
) -> DataFrame:
    """Regularize (keys, slot) series: one row per grid slot from each
    key's first to last observation, values forward-filled.

    ``slot_col`` must already be bucketed to multiples of ``step``
    (``u - u % step`` on the epoch — callers own the timestamp→slot cast;
    keeps the operator ANSI-pure). Multiple observations in one slot
    collapse to the one with the greatest ``order_col`` (must be unique
    within (keys, slot) for determinism — an event id, not a timestamp).
    Returns keys + ``grid_slot`` + value_cols + ``is_observed``.
    """
    reserved = {"grid_slot", "is_observed", "__slot", "__end"}
    clash = reserved & set([*keys, slot_col, *value_cols])
    if clash:
        # same contract as audio_quality._emit_spans: a name collision with
        # the operator's own output must fail loudly, not build a plan with
        # duplicate/ambiguous columns
        raise ValueError(f"column name(s) {sorted(clash)} are reserved by gap_fill")
    part = df.repartition(*[F.col(k) for k in keys])
    obs = part.groupBy(*keys, slot_col).agg(
        *[F.max_by(c, order_col).alias(c) for c in value_cols]
    )
    w = Window.partitionBy(*keys).orderBy(slot_col)
    nxt = F.lead(slot_col).over(w)
    fill_end = F.coalesce(nxt - step, F.col(slot_col))
    if max_fill is not None:
        fill_end = F.least(fill_end, F.col(slot_col) + step * int(max_fill))
    spans = obs.withColumn("__end", fill_end)
    return spans.select(
        *keys,
        F.explode(F.sequence(F.col(slot_col), F.col("__end"), F.lit(step))).alias(
            "grid_slot"
        ),
        *value_cols,
        F.col(slot_col).alias("__slot"),
    ).select(
        *keys,
        "grid_slot",
        *value_cols,
        (F.col("grid_slot") == F.col("__slot")).alias("is_observed"),
    )
