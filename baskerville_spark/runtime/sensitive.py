"""Sensitive-data split / re-merge around an anonymized prediction leg.

Reference: ``models/pipeline_tasks/tasks.py:1291-1428`` —
``CacheSensitiveData`` stashes the full row (keyed by uuid, TTL'd) in
Redis or a Kafka topic so only anonymized features travel to the
prediction service; ``MergeWithSensitiveData`` inner-joins the returning
predictions back on (id_client, uuid) and warns when the merge loses
rows (postprocessing lag). The client/server split exists so the
prediction service never sees IPs or hostnames.

Here the stash is a :class:`~baskerville_spark.runtime.state.StateStore`
(the same versioned-parquet + atomic-pointer store the feature cache
uses; Redis's ``ttl`` option maps to ``expire_state`` on read, its
``key.column`` to ``keys``). On a cluster the stash write is one line —
``sources/sinks.save_features(fmt='redis')`` or the kafka_shaped sink —
with identical split/merge semantics.

Scale: the merge is an equi-join on the uuid keys; the sensitive side is
bounded by TTL x ingest rate, the prediction side by the batch — both
narrow (no payloads). The count-mismatch check costs two count() jobs
exactly like the reference's; callers that cannot afford them at 10^12
rows can skip with ``report=False`` (the reference always pays them).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baskerville_spark.runtime.state import StateStore, expire_state


def split_sensitive(
    df: DataFrame,
    keys: list[str],
    sensitive_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """(anonymized, sensitive): the anonymized frame drops the sensitive
    columns; the sensitive frame carries keys + sensitive columns only
    (tasks.py:1302-1312 minus the to_json round-trip Redis needed)."""
    anonymized = df.drop(*sensitive_cols)
    sensitive = df.select(*keys, *sensitive_cols)
    return anonymized, sensitive


def cache_sensitive(
    df: DataFrame,
    store: StateStore,
    keys: list[str],
    sensitive_cols: list[str],
    ttl_s: int | None = None,
    now_epoch_s: float | None = None,
    updated_at_col: str = "updated_at",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Stash the sensitive slice (timestamped for TTL expiry) and return
    the anonymized frame for the prediction leg.

    The stash ACCUMULATES across batches, per key — a Redis SET per uuid
    does the same — so predictions lagging a batch or three behind
    (the reference's explicit merge-loss scenario, tasks.py:1411-1420)
    still find their rows. Each write keeps: this batch's rows, plus every
    prior key this batch didn't touch and TTL hasn't evicted. The stash is
    therefore bounded by TTL x ingest rate even though each version is a
    full rewrite (Iceberg: MERGE INTO; Redis: per-key ttl).
    """
    now = time.time() if now_epoch_s is None else now_epoch_s
    anonymized, sensitive = split_sensitive(df, keys, sensitive_cols)
    fresh = sensitive.withColumn(
        updated_at_col, F.lit(int(now)).cast("timestamp")
    )
    prior = store.read(spark or df.sparkSession)
    if prior is not None:
        if ttl_s is not None:
            prior = expire_state(prior, now, ttl_s, updated_at_col)
        untouched = prior.join(fresh.select(*keys), on=keys, how="left_anti")
        fresh = fresh.unionByName(untouched)
    # materialize before the pointer flip: the plan reads the CURRENT
    # version that write() is about to replace
    fresh = fresh.cache()
    fresh.count()
    store.write(fresh)
    fresh.unpersist()
    return anonymized


@dataclass(frozen=True)
class MergeReport:
    before: int
    after: int

    @property
    def lost(self) -> int:
        return self.before - self.after


def merge_sensitive(
    predictions: DataFrame,
    store: StateStore,
    spark: SparkSession,
    keys: list[str],
    ttl_s: int | None = None,
    now_epoch_s: float | None = None,
    updated_at_col: str = "updated_at",
    report: bool = True,
) -> tuple[DataFrame, MergeReport | None]:
    """Inner-join predictions back onto their stashed sensitive rows
    (tasks.py:1405-1408). Returns (merged, report); ``report.lost > 0``
    reproduces the reference's merge-loss warning (tasks.py:1411-1420) as
    data instead of log noise. TTL-expired stash rows drop before the
    join, exactly like Redis's ttl option would have evicted them."""
    stash = store.read(spark)
    if stash is None:
        raise ValueError("no sensitive stash has been written")
    if ttl_s is not None:
        now = time.time() if now_epoch_s is None else now_epoch_s
        stash = expire_state(stash, now, ttl_s, updated_at_col)
    merged = predictions.join(
        stash.drop(updated_at_col), on=keys, how="inner"
    )
    rep = None
    if report:
        rep = MergeReport(before=predictions.count(), after=merged.count())
    return merged, rep


# --------------------------------------------------------------------------
# Field-level AES-GCM encryption of sensitive columns
# --------------------------------------------------------------------------
#
# Reference: ``util/crypto.py:17-72`` (AES-GCM encrypt/decrypt with
# associated data; random 96-bit IV per value) wired through
# ``util/baskerville_tools.py:67-84`` to field-encrypt sensitive values
# (IPs, hostnames) with ``database.encryption_key`` before they land in
# storage. The reference runs this per value in driver-side Python; here it
# is Spark's NATIVE aes_encrypt/aes_decrypt expressions (JVM, codegen,
# zero Python in the path). Wire shape matches: GCM mode emits
# iv(12) || ciphertext(len(plain)) || tag(16) — the same (iv, ct, tag)
# triple the reference returns, concatenated.


def encrypt_columns(
    df: DataFrame,
    cols: list[str],
    key: str,
    aad_col: str | None = None,
) -> DataFrame:
    """AES-GCM-encrypt ``cols`` in place (values become binary).

    ``key`` must be 16/24/32 bytes (the reference derives a 32-byte key via
    sha256(passphrase) — do the same upstream). ``aad_col`` optionally
    binds each ciphertext to another column (e.g. the clip/run id): the
    reference's ``associated_data`` — decryption then fails loudly if a
    ciphertext is replayed onto a different row.
    """
    aad = F.col(aad_col) if aad_col else F.lit("")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.aes_encrypt(
                F.col(c).cast("string").cast("binary"),
                F.lit(key),
                F.lit("GCM"),
                F.lit("DEFAULT"),
                F.lit(b""),  # empty IV literal → random 96-bit IV per value
                aad.cast("string"),
            ),
        )
    return out


def decrypt_columns(
    df: DataFrame,
    cols: list[str],
    key: str,
    aad_col: str | None = None,
    permissive: bool = False,
) -> DataFrame:
    """Invert :func:`encrypt_columns` (values come back as string).

    ``permissive=True`` uses try_aes_decrypt: wrong-key / tampered / AAD-
    mismatched values decrypt to NULL instead of failing the job — the
    quarantine-friendly mode; default is the reference's fail-loud
    InvalidTag behavior (crypto.py:60-72).
    """
    fn = F.try_aes_decrypt if permissive else F.aes_decrypt
    aad = F.col(aad_col) if aad_col else F.lit("")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            fn(
                F.col(c),
                F.lit(key),
                F.lit("GCM"),
                F.lit("DEFAULT"),
                aad.cast("string"),
            ).cast("string"),
        )
    return out
