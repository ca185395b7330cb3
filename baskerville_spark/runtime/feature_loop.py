"""The reference's client pipeline loop: per-micro-batch feature
generation feeding an incrementally-refreshed feature cache.

Reference shape (``src/baskerville/models/pipelines.py`` /
``client_pipeline.py:37-48``): each 120 s time bucket runs
``GenerateFeatures`` (the full vector funnel over the batch's raw rows),
merges the fresh vectors with the cached past vectors per key
(``base_spark.py:803-867`` driving ``features/updateable_features.py``),
and republishes the cache (``RefreshCache`` →
``request_set_cache.py:62-97`` A/B parquet flip).

Here the same loop is one ``foreachBatch`` body over Structured
Streaming (or a plain function the batch path calls per partition):

    batch rows ─ feature_vector ─┐
                                 ├─ update_feature_vector ─ union with
    cache.read ──────────────────┘   untouched keys ─→ cache.write (atomic)

Scale notes:

- The merge join and the untouched-key anti-join are both keyed on the
  group key; the fresh side arrives hash-partitioned from its groupBy.
  Honest plan shape: the merge is ``fresh LEFT OUTER cache``, and Spark
  can only broadcast the BUILD (cache) side of that join — so with a
  large cache every micro-batch sort-merge-shuffles the cache, and the
  per-batch cost is O(cache), not O(batch keys). The reference accepted
  exactly this (its cache was a full parquet rewrite per batch,
  request_set_cache.py:62-97). The way out at 10^12 keys is not a
  broadcast hint but storage layout: bucket/partition the cache by a
  key hash and rewrite only buckets the batch touches (dynamic
  partition overwrite — runner.py does this for verdicts), or Iceberg
  MERGE INTO, which implements the same pruning inside the commit.
- State rewrite cost is proportional to cache size, not stream volume —
  the reference accepted the same trade (its cache was a full parquet
  rewrite per batch, request_set_cache.py:62-97). For key cardinality
  beyond a single rewrite, partition the cache by a key bucket and
  rewrite only buckets with updates (dynamic partition overwrite —
  runtime/runner.py does this for verdicts).
- ``streaming/stateful.py`` is the alternative when per-key state fits
  the applyInPandasWithState model; this loop is the one that matches
  the reference's cache semantics exactly (TTL expiry included).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baskerville_spark.functions.features import (
    UpdateSpec,
    update_feature_vector,
)
from baskerville_spark.runtime.state import StateStore, expire_state


def refresh_feature_cache(
    fresh: DataFrame,
    store: StateStore,
    spark: SparkSession,
    keys: list[str],
    specs: list[UpdateSpec],
    square_variance: bool = False,
    ttl_s: int | None = None,
    now_epoch_s: float | None = None,
    updated_at_col: str = "updated_at",
) -> DataFrame:
    """Merge one batch's fresh feature vectors into the persisted cache
    and atomically republish it. Returns the new cache DataFrame.

    ``fresh`` must carry ``keys`` + every column named in ``specs``.
    Untouched cache keys pass through unchanged; TTL-expired ones are
    dropped first when ``ttl_s`` is set (cache_expire_time,
    reference config.py:363-368 / request_set_cache.py:404-411).
    Defaults to the textbook pooled variance (``square_variance=False``)
    — the incremental==batch invariant below holds only for it; pass
    ``True`` for reference-verbatim merges.
    """
    now = time.time() if now_epoch_s is None else now_epoch_s
    fresh = fresh.withColumn(
        updated_at_col, F.lit(int(now)).cast("timestamp")
    )
    past = store.read(spark)
    if past is not None and ttl_s is not None:
        past = expire_state(past, now, ttl_s, updated_at_col)
    if past is None:
        new_state = fresh
    else:
        merged = update_feature_vector(
            fresh.drop(updated_at_col),
            past.drop(updated_at_col),
            keys,
            specs,
            square_variance=square_variance,
            round_dp=None,
            broadcast_past=False,
        ).withColumn(updated_at_col, F.lit(int(now)).cast("timestamp"))
        untouched = past.join(
            fresh.select(*keys), on=keys, how="left_anti"
        )
        new_state = merged.unionByName(untouched)
    # cache() before write+return: the plan reads the CURRENT pointer's
    # parquet, and write() flips that pointer — without materialization a
    # later action on the returned frame would re-read a replaced version.
    new_state = new_state.cache()
    new_state.count()
    store.write(new_state)
    # once the new version is on disk the cache has served its purpose;
    # dropping it here keeps a long-running stream from accumulating one
    # full cached state copy per micro-batch. A later action on the
    # returned frame re-derives it from the PRIOR version dir (StateStore
    # keeps old versions, so that stays correct); the next batch reads the
    # new version via store.read().
    new_state.unpersist()
    return new_state


def run_feature_loop(
    spark: SparkSession,
    source_dir: str,
    schema,
    store: StateStore,
    keys: list[str],
    specs: list[UpdateSpec],
    vector_fn: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    square_variance: bool = False,
    ttl_s: int | None = None,
):
    """Structured-Streaming form: file-per-micro-batch source (the same
    broker-free stand-in q45 uses — on a cluster only the source line
    changes to Kafka), ``vector_fn`` = the GenerateFeatures stage,
    ``refresh_feature_cache`` = the RefreshCache stage.

    Returns the StreamingQuery; callers awaitTermination/stop it.
    """

    def _batch(batch_df: DataFrame, _batch_id: int) -> None:
        fresh = vector_fn(batch_df)
        refresh_feature_cache(
            fresh,
            store,
            spark,
            keys,
            specs,
            square_variance=square_variance,
            ttl_s=ttl_s,
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
