"""Salted two-phase uniqueness check on clip_id.

The reference has NO skew story (SURVEY.md §4: hot (target, ip) groups land
on one reducer unmitigated); the north rule requires explicit salting here.

Phase 1 groups by (key, salt) where salt = spark_partition_id() % n_salt —
every (key, salt) group lives inside one input partition, so even a
pathological key duplicated 10^9 times fans its partial counts across
``n_salt`` reducers instead of one. Phase 2 sums the partials per key and
keeps count > 1. Both phases are plain HashAggregates with map-side combine;
no row ever leaves the JVM.

Equivalently (and what Catalyst ultimately executes for phase 1): a partial
aggregation keyed on the salted composite. The explicit formulation makes
the skew contract visible and testable — the property test asserts salted ==
naive ``groupBy(key).count()`` (FIXTURES.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
    n_salt: int = 64,
    scope_per_partition: bool = True,
) -> DataFrame:
    """Keys appearing more than once → (part_id?, key, dup_count).

    ``scope_per_partition=True`` checks uniqueness within each table
    partition (the per-partition verdict unit); False checks globally.
    """
    group_final = [part_col, key] if scope_per_partition else [key]
    salted = (
        df.select(*group_final)
        .withColumn("__salt", F.spark_partition_id() % n_salt)
        .groupBy(*group_final, "__salt")
        .agg(F.count(F.lit(1)).alias("partial_count"))
    )
    return (
        salted.groupBy(*group_final)
        .agg(F.sum("partial_count").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
    n_salt: int = 64,
) -> DataFrame:
    """Violation rows (VIOLATION_SCHEMA shape) for duplicated clip_ids."""
    dups = duplicate_keys(df, key, part_col, n_salt)
    return dups.select(
        F.col(part_col).cast("int").alias("part_id"),
        F.col(key).alias("clip_id"),
        F.lit("uniqueness").alias("check_name"),
        F.concat(F.lit("dup_count="), F.col("dup_count").cast("string")).alias("detail"),
    )


def naive_duplicate_keys(
    df: DataFrame, key: str = "clip_id", part_col: str = "part_id"
) -> DataFrame:
    """Unsalted oracle for the property test (small data only)."""
    return (
        df.groupBy(part_col, key)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
