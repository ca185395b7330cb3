"""Per-row audio + transcript invariant, evaluated in Arrow-batched pandas UDFs.

The invariant (BASELINE.json input_hint): decoded PCM must match the
deterministic reference signal with SNR >= 30 dB, and the transcript must
equal the authoritative transcript. The reference's per-row analogs are all
row-at-a-time Python UDFs (SURVEY.md §2.9, e.g. udf_compute_geotime at
src/baskerville/spark/udfs.py:41-62) — forbidden here; we use
``mapInPandas`` so rows cross the JVM/Python boundary in Arrow record
batches (capped by spark.sql.execution.arrow.maxRecordsPerBatch, see
session.py — audio payloads make batch sizing a memory-safety issue).

Scale notes:
- The transcript dim is joined BEFORE the decode stage with a broadcast (or
  AQE-chosen) equi-join, never looked up from Python.
- Decode is embarrassingly parallel; no shuffle. The only movement is the
  Arrow exchange. numpy work inside is per-clip vectorized.
- Output is narrow (booleans + floats) — payload bytes are dropped on the
  Python side and never re-serialized.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from baskerville_spark import audio

INVARIANT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("snr_db", T.DoubleType(), True),
        T.StructField("snr_ok", T.BooleanType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("transcript_ok", T.BooleanType(), True),
    ]
)


def _check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        n = len(b)
        out = {
            "part_id": b["part_id"].astype("int32"),
            "clip_id": b["clip_id"],
            "snr_db": pd.Series([None] * n, dtype="float64"),
            "snr_ok": pd.Series([False] * n, dtype="bool"),
            "decode_ok": pd.Series([False] * n, dtype="bool"),
            "transcript_ok": pd.Series([None] * n, dtype="object"),
        }
        for idx in range(n):
            row = b.iloc[idx]
            payload, codec = row["bytes"], row["codec"]
            pcm = audio.decode(bytes(payload), codec) if payload is not None else None
            if pcm is not None and len(pcm) > 0:
                sr = int(row["sr_hz"]) if pd.notna(row["sr_hz"]) else 16000
                # reference signal regenerated deterministically from clip_id;
                # sample count inferred from the decoded payload (dur_ms may
                # be null/bad — that's the range check's job, not this one's)
                ref = audio.synth_pcm_n(row["clip_id"], sr, len(pcm))
                s = audio.snr_db(ref, pcm)
                out["snr_db"].iloc[idx] = s if s not in (float("inf"),) else 999.0
                out["snr_ok"].iloc[idx] = s >= audio.SNR_THRESHOLD_DB
                out["decode_ok"].iloc[idx] = True
            t_ref = row.get("transcript_ref")
            if t_ref is not None and pd.notna(t_ref):
                out["transcript_ok"].iloc[idx] = str(row["transcript"]) == str(t_ref)
        yield pd.DataFrame(out)


def audio_invariant(
    clips: DataFrame,
    transcript_ref: DataFrame | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Evaluate the decode + transcript invariant; returns INVARIANT_RESULT rows.

    transcript_ok is null when the clip has no reference transcript (that
    case is the referential-integrity check's job, not this one's).
    """
    cols = ["part_id", "clip_id", "bytes", "sr_hz", "codec", "transcript"]
    df = clips.select(*cols)
    if transcript_ref is not None:
        dim = transcript_ref.select("clip_id", "transcript_ref")
        if broadcast_dim:
            dim = F.broadcast(dim)
        df = df.join(dim, on="clip_id", how="left")
    else:
        df = df.withColumn("transcript_ref", F.lit(None).cast("string"))
    return df.mapInPandas(_check_batches, schema=INVARIANT_RESULT_SCHEMA)


def invariant_violations(results: DataFrame) -> DataFrame:
    """Violation rows (VIOLATION_SCHEMA) from invariant results."""
    snr = results.where(~F.col("snr_ok")).select(
        "part_id",
        "clip_id",
        F.when(F.col("decode_ok"), F.lit("snr")).otherwise(F.lit("decode_error")).alias("check_name"),
        F.concat(F.lit("snr_db="), F.coalesce(F.round("snr_db", 2).cast("string"), F.lit("nan"))).alias("detail"),
    )
    tr = results.where(F.col("transcript_ok") == False).select(  # noqa: E712
        "part_id",
        "clip_id",
        F.lit("transcript_eq").alias("check_name"),
        F.lit("transcript != transcript_ref").alias("detail"),
    )
    return snr.unionByName(tr)
