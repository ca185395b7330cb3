"""Table source registry: one entry point for every storage format.

The reference hard-wires five source types across its pipelines (raw JSON,
Kafka, ElasticSearch, JDBC, parquet cache — SURVEY.md §2.1); here a single
`read_table` dispatches on format, and Iceberg is attempted first when
requested (jars absent in this container → graceful parquet fallback,
keeping call sites cluster-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read a table by format name: parquet | iceberg | json | csv | orc | jdbc.

    'iceberg' needs the runtime jars on the classpath (standard on a real
    cluster); without them it falls back to reading the same path as parquet
    so local tests exercise identical call sites.
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").options(**options).load(path)
        except Exception:  # jars not on classpath → local fallback
            fmt = "parquet"
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "jdbc":
        return reader.format("jdbc").load()
    raise ValueError(f"unknown format {fmt!r}")
