"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Audio decode is REAL in this repo (baskerville_spark.audio — deterministic
codec stand-ins). Image/video decode libraries are not in the container, so
those decoders are stubs behind ``NotImplementedError`` — but the Spark-side
plumbing (schema, Arrow batch shape, UDF signature, partition behavior) is
real and tested: swap the `_decode_*` body for Pillow/PyAV and nothing else
changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """Stub: real impl would be Pillow/turbojpeg. Deterministic fake for the
    synthetic 'rawgray' format (w:h header + raw bytes); everything else is
    not implemented in this container."""
    if fmt == "rawgray":
        w = int.from_bytes(payload[0:4], "little")
        h = int.from_bytes(payload[4:8], "little")
        arr = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
        if len(arr) != w * h:
            raise ValueError("truncated rawgray payload")
        return arr.reshape(h, w, 1)
    raise NotImplementedError(f"image codec {fmt!r} needs Pillow/PyAV (not in container)")


def image_features(df: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """mapInPandas over (item_id, payload, fmt) → typed image metadata.

    Arrow batches bounded by maxRecordsPerBatch (payloads are large);
    output is narrow — payload bytes never return to the JVM.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                try:
                    img = _decode_image(bytes(r["payload"]), r[fmt_col])
                    rows.append(
                        {
                            "item_id": r["item_id"],
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "n_channels": img.shape[2],
                            "mean_luma": float(img.mean()),
                            "decode_ok": True,
                        }
                    )
                except (NotImplementedError, ValueError):
                    rows.append(
                        {
                            "item_id": r["item_id"],
                            "width": None,
                            "height": None,
                            "n_channels": None,
                            "mean_luma": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select("item_id", "payload", fmt_col).mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )
