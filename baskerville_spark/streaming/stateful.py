"""Streaming stateful aggregation: the reference's hand-rolled two-layer
request-set cache (src/baskerville/models/request_set_cache.py:318-434 —
full_outer join + column coalesce + TTL + parquet rewrite per micro-batch)
re-expressed as Spark's native ``applyInPandasWithState``.

Semantics preserved:
- state keyed by group (reference: (target, ip); here: configurable key)
- incremental merge of per-batch aggregates with prior state
  (count/min/max/mean merge like updateable_features.py:46-141)
- TTL expiry via state timeout (reference cache_expire_time,
  config.py:363-368)

Scale: state lives in the state store (RocksDB on a real cluster), sharded
by key hash; each micro-batch touches only keys present in the batch —
exactly the pruning the reference did manually with a semi-join.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_total", T.LongType(), False),
        T.StructField("n_batches", T.LongType(), False),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("mean_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_total", T.LongType(), False),
        T.StructField("n_values", T.LongType(), False),
        T.StructField("n_batches", T.LongType(), False),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, nv, b, mn, mx, sm = (
        state.get if state.exists else (0, 0, 0, None, None, 0.0)
    )
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        b += 1
        if len(vals):
            nv += len(vals)
            vmn, vmx, vsm = float(vals.min()), float(vals.max()), float(vals.sum())
            mn = vmn if mn is None else min(mn, vmn)
            mx = vmx if mx is None else max(mx, vmx)
            sm = (sm or 0.0) + vsm
    state.update((n, nv, b, mn, mx, sm))
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "n_total": n,
                "n_batches": b,
                "min_value": mn,
                "max_value": mx,
                # mean over the NON-NULL values only: n_total counts all rows
                # (the reference's request count), but a null value must not
                # drag the mean toward zero
                "mean_value": (sm / nv) if nv else None,
            }
        ]
    )


def incremental_group_stats(
    stream: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Stateful per-key incremental stats over a stream.

    Input stream needs columns (key_col, value_col); output one row per key
    per batch with merged lifetime stats — the RequestSet incremental-update
    semantics (subset_count ≙ n_batches, base_spark.py:849-852).
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
