"""The reference's feature-sink zoo behind one dispatch.

Reference: ``models/pipeline_tasks/tasks.py:1572-1675`` — three Save
tasks (TileDB :1572-1597, HBase :1601-1646, Hive :1649-1675) that all do
the same thing: unwrap the features map into flat columns, select the
canonical row ``(rowkey, prediction, score, stop, *features)``, and call
``df.write.format(<connector>).save()``. (The reference's Hive task
actually writes TileDB — a copy-paste bug at tasks.py:1660-1666; here
'table' gets real table semantics.)

Dispatch tiers, honest about what runs where:

- ``table``   — ``saveAsTable`` against the session catalog. REAL here
  (vanilla Spark catalog + warehouse dir; on a cluster the same call hits
  the Hive metastore). Round-trip tested.
- ``parquet/orc/csv/json/iceberg`` — delegate to
  :func:`baskerville_spark.sources.registry.write_table` (iceberg with
  its parquet fallback).
- ``tiledb / hbase / elasticsearch / redis`` — the EXACT reference
  connector invocations (format string, catalog json, option names).
  Their jars are not in this container, so the attempt raises
  ``NotImplementedError`` naming the missing package — the same
  seam contract as the optional audio/image codecs
  (functions/multimodal.py): on a cluster with the jar, the write
  proceeds; nothing else changes. The seam is contract-tested by
  asserting the dispatch reaches Spark with the exact connector string.

Scale: every sink receives an already-narrow verdict/feature frame (the
runner's outputs) — payloads never reach a sink. Connector-side batching
knobs (JDBC batchsize etc.) live with the JDBC helpers in
sources/registry.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baskerville_spark.sources.registry import write_table

_CONNECTOR_FORMATS = {
    "tiledb": "io.tiledb.spark",  # tasks.py:1588
    "hbase": "org.apache.spark.sql.execution.datasources.hbase",  # :1643
    "elasticsearch": "org.elasticsearch.spark.sql",
    "redis": "org.apache.spark.sql.redis",
}


def unwrap_features(
    df: DataFrame,
    feature_names: list[str],
    features_col: str = "features",
) -> DataFrame:
    """Flatten the features map/struct into one column per feature — the
    loop every Save task opens with (tasks.py:1579-1581 etc.), as a single
    select instead of N withColumns (each withColumn is an analysis pass;
    at 39 features that is 39 re-analyses of the plan)."""
    return df.select(
        "*",
        *[
            F.col(features_col).getItem(name).alias(name)
            for name in feature_names
        ],
    ).drop(features_col)


def save_features(
    df: DataFrame,
    fmt: str,
    rowkey: str = "uuid_request_set",
    feature_names: list[str] | None = None,
    features_col: str | None = None,
    select_cols: tuple[str, ...] = ("prediction", "score", "stop"),
    path: str | None = None,
    table: str = "request_sets",
    mode: str = "overwrite",
    **options,
) -> str:
    """Write the canonical feature/verdict row to the named sink.

    Returns the format actually used (matters for iceberg's parquet
    fallback). Connector formats raise ``NotImplementedError`` naming the
    missing jar when it is absent — the documented optional-connector
    seam.
    """
    feature_names = feature_names or []
    if features_col:
        df = unwrap_features(df, feature_names, features_col)
    out = df.select(
        rowkey,
        *[c for c in select_cols if c in df.columns],
        *feature_names,
    )

    if fmt == "table":
        (
            out.write.mode(mode)
            .options(**options)
            .saveAsTable(table)
        )
        return "table"
    if fmt in ("parquet", "orc", "csv", "json", "iceberg"):
        if path is None:
            raise ValueError(f"{fmt!r} sink needs a path")
        return write_table(out, path, fmt=fmt, mode=mode, table=table, **options)
    if fmt not in _CONNECTOR_FORMATS:
        raise ValueError(f"unknown sink {fmt!r}")

    spark_format = _CONNECTOR_FORMATS[fmt]
    writer = out.write.mode(mode).format(spark_format)
    if fmt == "tiledb":  # tasks.py:1588-1594, verbatim option names
        writer = writer.option(
            "uri", options.pop("uri", path or "tiledbstorage")
        ).option("schema.dim.0.name", rowkey)
    elif fmt == "hbase":  # tasks.py:1608-1646: json catalog, cf1 family
        catalog = {
            "table": {"namespace": "default", "name": table},
            "rowkey": rowkey,
            "columns": {
                rowkey: {"cf": "rowkey", "col": rowkey, "type": "string"},
                **{
                    c: {"cf": "cf1", "col": c, "type": "double"}
                    for c in list(select_cols) + feature_names
                    if c in out.columns
                },
            },
        }
        writer = writer.options(catalog=json.dumps(catalog))
    elif fmt == "elasticsearch":
        writer = writer.option(
            "es.resource", options.pop("es_resource", f"{table}/_doc")
        )
    elif fmt == "redis":
        writer = writer.option("table", table).option("key.column", rowkey)
    if options:
        writer = writer.options(**options)
    try:
        writer.save()
    except Exception as exc:  # jar absent → honest optional-connector seam
        msg = str(exc)
        # Match ONLY missing-data-source signatures. Matching the connector
        # name anywhere in the message would misclassify REAL connector
        # failures (a Py4JJavaError's stringified stack trace contains the
        # connector's class names even when the jar IS present and the
        # actual failure is connectivity/auth), hiding the true error
        # behind a bogus "jar missing" seam (round-4 review catch).
        if (
            "ClassNotFoundException" in msg
            or "Failed to find data source" in msg
            or "Failed to find the data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            raise NotImplementedError(
                f"{fmt} sink needs the {spark_format} connector jar on the "
                f"cluster classpath; not present in this environment"
            ) from exc
        raise
    return fmt
