"""Typed schemas for the validation engine + JSON-schema translation.

The reference declares its input schema as a JSON Schema document translated
to a Spark StructType at runtime (src/baskerville/models/log_parsers.py:128-166,
type map at 134-139, recursive nested structs at 147-164). We keep that
capability (``struct_type_from_json_schema``) and add the typed schemas the
new engine needs: clips, transcript reference dim, verdicts, violations,
stats rows, baseline snapshots, and the checkpoint manifest.

Unlike the reference's stringly ``features`` JSON blob
(src/baskerville/db/models.py:108), all metrics here are typed columns.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Input tables (BASELINE.json input_hint)
# --------------------------------------------------------------------------

#: Audio clip fact table. At design scale an Iceberg table partitioned by
#: bucket(clip_id) x days(ingested_at); `part_id` stands in for the Iceberg
#: partition id in this repo (parquet partitioned by part_id).
CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)

#: Referential-integrity dimension: authoritative transcript per clip.
TRANSCRIPT_REF_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("transcript_ref", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Output tables
# --------------------------------------------------------------------------

#: One row per (part_id, check). Analog of the reference RequestSet verdict
#: row (src/baskerville/db/models.py:78-160: prediction/score/label per group)
#: and its threshold verdict (tasks.py:1784-1794).
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("metric_value", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("n_violations", T.LongType(), True),
    ]
)

#: One row per violating clip.
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),
    ]
)

#: Per-(partition, column) statistics row — the typed replacement of the
#: reference's MapType feature blob (base_spark.py:818-829).
STATS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("count", T.LongType(), True),
        T.StructField("null_count", T.LongType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("approx_distinct", T.LongType(), True),
        T.StructField("quantiles", T.ArrayType(T.DoubleType()), True),
    ]
)

#: Baseline snapshot for drift checks — the generalization of the reference's
#: per-target avg/stddev snapshot (src/baskerville/models/incident_detector.py:264-289).
BASELINE_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # 'numeric' | 'categorical'
        T.StructField("bin_edges", T.ArrayType(T.DoubleType()), True),
        T.StructField("categories", T.ArrayType(T.StringType()), True),
        T.StructField("bin_fractions", T.ArrayType(T.DoubleType()), False),
        T.StructField("quantiles", T.ArrayType(T.DoubleType()), True),
        T.StructField("n", T.LongType(), False),
    ]
)

#: Checkpoint manifest: Runtime-ledger semantics (src/baskerville/db/models.py:41-75,
#: completion update base_spark.py:567-579) done idempotently per partition.
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # 'done'
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("n_violations", T.LongType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("code_version", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# JSON-schema translation (reference parity: log_parsers.py:128-166)
# --------------------------------------------------------------------------

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "number": T.FloatType(),
    "integer": T.IntegerType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
}


def struct_type_from_json_schema(schema_doc: dict[str, Any]) -> T.StructType:
    """Translate a JSON-Schema-ish document into a StructType.

    Mirrors the reference's translation (log_parsers.py:134-164): the type
    map {'string'→String, 'number'→Float, 'integer'→Integer,
    'object'→nested StructType}, recursing into nested objects.
    """
    fields = []
    for name, spec in schema_doc.get("properties", {}).items():
        jtype = spec.get("type", "string")
        if jtype == "object":
            dtype: T.DataType = struct_type_from_json_schema(spec)
        elif jtype == "array":
            items = spec.get("items", {"type": "string"})
            if items.get("type") == "object":
                elem: T.DataType = struct_type_from_json_schema(items)
            else:
                elem = _TYPE_MAP.get(items.get("type", "string"), T.StringType())
            dtype = T.ArrayType(elem)
        else:
            dtype = _TYPE_MAP.get(jtype, T.StringType())
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)
