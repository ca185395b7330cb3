"""Incremental state cache: the reference's two-layer request-set cache
rebuilt as a declarative upsert + TTL expiry.

Reference semantics (src/baskerville/models/request_set_cache.py):
- enrich: batch LEFT-joins the cache on (target, ip), null-coalescing
  duplicate columns (207-251)
- prune: cache rows restricted to keys present in the batch (253-304 inner
  join on distinct keys → left_semi here)
- upsert: FULL_OUTER join on keys, per-column when(new.isNotNull(), new)
  .otherwise(old) (370-400)
- TTL expiry: updated_at >= now - expire_seconds (404-411), default 86400 s
  (config.py:363-368)
- persistence: parquet with A/B file alternation for atomicity (62-97) —
  here: versioned directories + current-pointer file (same idea, explicit);
  on Iceberg this is MERGE INTO + snapshot commit.

Scale notes: the upsert is one sort-merge full-outer join keyed on the cache
key; both sides are pre-projected to key + state columns. Enrich broadcasts
the cache when small, else AQE picks sort-merge.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TTL_S = 86_400  # reference default cache_expire_time (config.py:363-368)


def enrich_with_state(
    batch: DataFrame,
    state: DataFrame,
    keys: list[str],
    state_cols: list[str],
    prefix: str = "old_",
) -> DataFrame:
    """LEFT join prior state onto the batch (request_set_cache.py:207-251).

    State columns arrive prefixed (old_*) so feature update expressions can
    reference both the fresh and prior value.
    """
    renamed = state.select(
        *keys, *[F.col(c).alias(f"{prefix}{c}") for c in state_cols]
    )
    return batch.join(renamed, on=keys, how="left")


def prune_state_to_batch(state: DataFrame, batch: DataFrame, keys: list[str]) -> DataFrame:
    """Restrict state to keys present in the batch — left_semi (the
    reference used inner on distinct keys, 253-304; semi is the semantics)."""
    return state.join(batch.select(*keys).distinct(), on=keys, how="left_semi")


def upsert_state(
    state: DataFrame,
    updates: DataFrame,
    keys: list[str],
    value_cols: list[str],
    updated_at_col: str = "updated_at",
) -> DataFrame:
    """FULL_OUTER merge with PER-COLUMN null-coalescing: each column takes
    the update's value when non-null, else the prior state's.

    INTENTIONAL DEVIATION from the reference (request_set_cache.py:370-400):
    there the coalesce is keyed on a ROW-LEVEL presence flag
    (``features.isNotNull()``), so a present update row replaces *every*
    column — including replacing a prior value with NULL. Per-column
    coalesce was chosen deliberately instead because (a) a partial update
    row (NULL in one column) refreshes the other columns without clobbering
    the one it doesn't carry, and (b) it needs no row-presence marker, which
    makes the merge correct for null-valued keys too (the eqNullSafe join
    already matches them; a row-level form keyed on ``keys[0].isNotNull()``
    drops a null-keyed update's values). The trade-off: this merge can never
    clear a column back to NULL — updaters that need explicit clearing must
    write a sentinel, not NULL. On Iceberg: MERGE INTO."""
    s = state.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in value_cols + [updated_at_col]],
    )
    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in value_cols + [updated_at_col]],
    )
    cond = None
    for k in keys:
        c = s[f"__s_{k}"].eqNullSafe(u[f"__u_{k}"])
        cond = c if cond is None else (cond & c)
    joined = s.join(u, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"__u_{k}"), F.col(f"__s_{k}")).alias(k) for k in keys
    ]
    for c in value_cols + [updated_at_col]:
        out_cols.append(
            F.coalesce(F.col(f"__u_{c}"), F.col(f"__s_{c}")).alias(c)
        )
    return joined.select(*out_cols)


def expire_state(
    state: DataFrame,
    now_epoch_s: float,
    ttl_s: int = DEFAULT_TTL_S,
    updated_at_col: str = "updated_at",
) -> DataFrame:
    """TTL filter (request_set_cache.py:404-411)."""
    cutoff = now_epoch_s - ttl_s
    return state.where(
        F.unix_timestamp(F.col(updated_at_col).cast("timestamp")) >= F.lit(cutoff)
    )


class StateStore:
    """Versioned-parquet state persistence with an atomic current-pointer.

    The reference flipped between two fixed parquet files (A/B,
    request_set_cache.py:62-97); versioned dirs + a pointer file generalize
    that (no reader ever sees a half-written directory). On Iceberg the
    snapshot log plays this role.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._ptr = os.path.join(root, "CURRENT")

    def current_path(self) -> str | None:
        if not os.path.exists(self._ptr):
            return None
        with open(self._ptr) as f:
            return os.path.join(self.root, json.load(f)["version"])

    def read(self, spark: SparkSession) -> DataFrame | None:
        p = self.current_path()
        return spark.read.parquet(p) if p else None

    def write(self, df: DataFrame) -> str:
        version = f"v_{int(time.time() * 1000)}_{uuid.uuid4().hex[:6]}"
        path = os.path.join(self.root, version)
        df.write.mode("overwrite").parquet(path)
        tmp = self._ptr + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._ptr)  # atomic pointer flip
        return path
