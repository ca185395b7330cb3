"""Partition completeness + freshness check against a baseline manifest:
did every expected partition arrive, with roughly the expected volume, and
recently enough?

The reference keeps its temporal partitions healthy imperatively — the DDL
generator pre-creates time partitions with a catch-all for strays
(src/baskerville/db/temporal_partition.py:244-266) and maintain_db
(src/baskerville/db/database_maintenance.py:20) re-runs the generator on a
schedule — but nothing ever VERIFIES that a partition that should have data
actually got it. This check is that verification, engine-native: a baseline
manifest (expected rows + expected latest event time per partition, itself
producible by ``expected_from_snapshot`` over a known-good snapshot) is
joined against the current table's observed per-partition profile.

Scale shape: ONE aggregation pass over the fact table produces a
|partitions|-sized profile (count + max event ts — both map-side combined);
the manifest is tiny and broadcast. Nothing wide shuffles; the fact table
is read once with only (part_col, ts_col) projected, so the parquet scan
prunes every payload column.

Verdicts per partition:
  missing_partition      expected but absent entirely            violation
  row_count_low          observed < expected * (1 - tolerance)   violation
  stale_partition        observed max ts lags expected           violation
  unexpected_partition   present but not in the manifest         advisory
  ok                     none of the above
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observed_profile(
    df: DataFrame, part_col: str, ts_col: str | None = None
) -> DataFrame:
    """(partition, n_rows[, max_ts]) in one narrow aggregation pass."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if ts_col is not None:
        aggs.append(F.max(ts_col).alias("max_ts"))
    return df.groupBy(F.col(part_col).alias("partition")).agg(*aggs)


def expected_from_snapshot(
    df: DataFrame, part_col: str, ts_col: str | None = None
) -> DataFrame:
    """Build the baseline manifest from a known-good snapshot:
    (partition, expected_rows[, expected_max_ts])."""
    prof = observed_profile(df, part_col, ts_col)
    cols = [F.col("partition"), F.col("n_rows").alias("expected_rows")]
    if ts_col is not None:
        cols.append(F.col("max_ts").alias("expected_max_ts"))
    return prof.select(*cols)


def completeness_verdicts(
    current: DataFrame,
    expected: DataFrame,
    part_col: str,
    ts_col: str | None = None,
    count_tolerance: float = 0.10,
    max_staleness_s: int | None = None,
) -> DataFrame:
    """One verdict row per partition seen on either side.

    ``expected`` carries (partition, expected_rows[, expected_max_ts]).
    ``count_tolerance`` is the fraction of expected volume a partition may
    fall short by before it's a violation; ``max_staleness_s`` bounds how
    far the observed max event time may lag the expected one (requires
    ts_col and expected_max_ts). Both join inputs are O(partitions) —
    |partitions|-sized aggregates of a scan that projected two columns —
    so the full-outer exchange (Spark cannot broadcast a full-outer build
    side) moves manifest-sized data, never row-sized."""
    obs = observed_profile(current, part_col, ts_col)
    j = obs.alias("o").join(
        expected.alias("e"),
        on=F.col("o.partition") == F.col("e.partition"),
        how="full_outer",
    )
    n, exp = F.col("o.n_rows"), F.col("e.expected_rows")
    floor = F.ceil(exp * F.lit(1.0 - count_tolerance)).cast("long")
    status = (
        F.when(exp.isNull(), F.lit("unexpected_partition"))
        .when(n.isNull(), F.lit("missing_partition"))
        .when(n < floor, F.lit("row_count_low"))
    )
    if ts_col is not None and max_staleness_s is not None:
        lag = F.unix_seconds(
            F.col("e.expected_max_ts").cast("timestamp")
        ) - F.unix_seconds(F.col("o.max_ts").cast("timestamp"))
        status = status.when(
            F.col("e.expected_max_ts").isNotNull() & (lag > F.lit(max_staleness_s)),
            F.lit("stale_partition"),
        )
    return j.select(
        F.coalesce(F.col("o.partition"), F.col("e.partition")).alias("partition"),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_rows"),
        exp.cast("long").alias("expected_rows"),
        status.otherwise(F.lit("ok")).alias("status"),
    )
