"""Iceberg DDL generation — the reference's DB schema/partition installer.

Reference: ``db/__init__.py:31-82,143-230`` builds the results store by
hand on Postgres — per-month child tables via table inheritance
(``get_table_inheritance_script_for``), a plpgsql BEFORE-INSERT trigger
routing each row to its month child (``get_f_request_sets_insert_by_month``,
``get_before_insert_trigger``), and ``db/data_partitioning.py`` planning
temporal partition windows. On Iceberg that entire apparatus is ONE
declarative clause: ``PARTITIONED BY (months(created_at))`` — hidden
partitioning routes writes and prunes reads with no triggers, no child
tables, no manual maintenance, and transforms can evolve without rewriting
data. This module renders that DDL from a Spark schema; execution goes
through ``spark.sql`` against whatever catalog the session has (the same
V2-catalog seam as ``registry.write_table``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# temporal granularity → Iceberg partition transform
# (reference data_partitioning.py plans 'month'/'week' windows; Iceberg has
# years/months/days/hours — weekly maps to days, the finer prune)
TEMPORAL_TRANSFORMS = {
    "year": "years",
    "month": "months",
    "week": "days",
    "day": "days",
    "hour": "hours",
}


def _sql_type(dt: T.DataType) -> str:
    return dt.simpleString()


def iceberg_ddl(
    table: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
    temporal_col: str | None = None,
    granularity: str = "month",
    bucket_by: tuple[str, int] | None = None,
    table_props: dict[str, str] | None = None,
    replace: bool = False,
) -> str:
    """Render ``CREATE [OR REPLACE] TABLE ... USING iceberg`` DDL.

    ``temporal_col``+``granularity`` produce the hidden-partitioning
    transform that replaces the reference's month-inheritance +
    insert-trigger machinery; ``bucket_by=(col, n)`` adds the hash-bucket
    transform (the co-located-join layout the 10^12-row design wants on
    clip_id); ``partition_by`` passes identity columns through verbatim.
    """
    if granularity not in TEMPORAL_TRANSFORMS:
        raise ValueError(
            f"granularity {granularity!r} not in {sorted(TEMPORAL_TRANSFORMS)}"
        )
    # backtick-quote column names (reserved words, spaces) and escape any
    # embedded backtick — schema field names are data here, not trusted SQL
    cols = ",\n  ".join(
        f"`{f.name.replace('`', '``')}` {_sql_type(f.dataType)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    parts: list[str] = []
    if temporal_col is not None:
        if temporal_col not in schema.fieldNames():
            raise ValueError(f"temporal_col {temporal_col!r} not in schema")
        parts.append(f"{TEMPORAL_TRANSFORMS[granularity]}({temporal_col})")
    if bucket_by is not None:
        bcol, n = bucket_by
        if bcol not in schema.fieldNames():
            raise ValueError(f"bucket_by column {bcol!r} not in schema")
        parts.append(f"bucket({int(n)}, {bcol})")
    for c in partition_by or []:
        if c not in schema.fieldNames():
            raise ValueError(f"partition column {c!r} not in schema")
        parts.append(c)
    stmt = [
        ("CREATE OR REPLACE TABLE" if replace else "CREATE TABLE") + f" {table} (",
        f"  {cols}",
        ") USING iceberg",
    ]
    if parts:
        stmt.append("PARTITIONED BY (" + ", ".join(parts) + ")")
    props = dict(table_props or {})
    if props:
        # single quotes in keys/values doubled per SQL string-literal rules
        def q(s: str) -> str:
            return "'" + str(s).replace("'", "''") + "'"

        kv = ", ".join(f"{q(k)} = {q(v)}" for k, v in sorted(props.items()))
        stmt.append(f"TBLPROPERTIES ({kv})")
    return "\n".join(stmt)
