"""Newline-JSON log source with declared-schema enforcement.

Reference parity: `RawLogPipeline.get_data` reads newline JSON with
`spark.read.json` against a JSON-Schema-declared StructType
(src/baskerville/models/pipelines.py:218-231 +
src/baskerville/models/log_parsers.py:128-166), then applies
required/default/null-drop semantics (log_parsers.py:173-250).

Never infer schema in production: a declared schema makes the scan a single
pass (no sampling job) and catches drift as nulls instead of silent type
widening.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from baskerville_spark.checks.schema_check import ColumnSpec, enforce_schema
from baskerville_spark.schema import struct_type_from_json_schema


def specs_from_json_schema(schema_doc: dict[str, Any]) -> list[ColumnSpec]:
    """Translate JSON-Schema 'required'/'default'/'pattern' declarations into
    ColumnSpecs — including the regex patterns the reference declared but
    never enforced (SURVEY.md §1.2)."""
    required = set(schema_doc.get("required", []))
    drop = set(schema_doc.get("drop_if_missing", []))
    out = []
    for name, spec in schema_doc.get("properties", {}).items():
        jtype = spec.get("type", "string")
        dtype = {"string": "string", "number": "float", "integer": "int",
                 "boolean": "boolean", "timestamp": "timestamp"}.get(jtype, "string")
        out.append(
            ColumnSpec(
                name=name,
                dtype=dtype,
                required=name in required,
                default=spec.get("default"),
                drop_if_missing=name in drop,
                pattern=spec.get("pattern"),
            )
        )
    return out


def read_json_logs(
    spark: SparkSession,
    path: str,
    schema_doc: dict[str, Any],
    enforce: bool = True,
) -> DataFrame:
    """Read newline JSON with the declared schema; optionally apply the full
    enforcement funnel (add-missing → fill-defaults → drop-if-missing)."""
    st = struct_type_from_json_schema(schema_doc)
    df = spark.read.schema(st).json(path)
    if enforce:
        df = enforce_schema(df, specs_from_json_schema(schema_doc))
    return df
