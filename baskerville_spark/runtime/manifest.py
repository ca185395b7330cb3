"""Checkpoint manifest: per-partition lineage + metrics, atomic commits.

Reference parity: the Runtime ledger row — one row per engine run with
start/stop/processed flag/n_request_sets (src/baskerville/db/models.py:41-75,
completion update src/baskerville/models/base_spark.py:567-579) — made
per-partition and idempotent. The reference's cache used A/B parquet file
alternation for atomicity (src/baskerville/models/request_set_cache.py:62-97);
here each partition commit is a single parquet file written to a temp name
and ``os.replace``-d into the manifest directory (atomic on POSIX). On a
real deployment this directory is an Iceberg table and the commit is a
snapshot append — the interface is the same.

Resume contract: pending = all_partitions − done (anti-join semantics); a
killed job re-runs only unfinished partitions and re-commits are idempotent
(same part_id overwrites by filename).
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from baskerville_spark import __version__
from baskerville_spark.schema import MANIFEST_SCHEMA

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("attempt", pa.int32(), nullable=False),
        pa.field("n_rows", pa.int64()),
        pa.field("n_violations", pa.int64()),
        pa.field("started_at", pa.timestamp("us", tz="UTC")),
        pa.field("finished_at", pa.timestamp("us", tz="UTC")),
        pa.field("code_version", pa.string()),
    ]
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    return spark.read.schema(MANIFEST_SCHEMA).parquet(path)


def done_partitions(spark: SparkSession, path: str) -> set[int]:
    """Done-mark part_ids. ``commit_partition`` writes one tiny LOCAL
    parquet file per partition with pyarrow; read them back the same way —
    a Spark job (scan + collect) for O(partitions) driver-local files was
    pure scheduling overhead (~1 s per resumable run at local[32]). The
    Spark read stays as the fallback for a manifest directory this process
    didn't write (e.g. a future non-posix deployment swapping the commit
    path for an Iceberg table)."""
    if not os.path.isdir(path):
        return set()
    try:
        out: set[int] = set()
        for f in os.listdir(path):
            if not f.endswith(".parquet") or f.startswith("._tmp"):
                continue
            t = pq.read_table(
                os.path.join(path, f), columns=["part_id", "status"]
            )
            for pid, st in zip(
                t.column("part_id").to_pylist(), t.column("status").to_pylist()
            ):
                if st == "done":
                    out.add(pid)
        return out
    except (OSError, pa.ArrowInvalid):
        m = read_manifest(spark, path)
        if m is None:
            return set()
        return {
            r["part_id"]
            for r in m.where("status = 'done'").select("part_id").collect()
        }


def commit_partition(
    path: str,
    part_id: int,
    n_rows: int,
    n_violations: int,
    started_at: datetime,
    attempt: int = 1,
) -> None:
    """Atomically record one finished partition."""
    os.makedirs(path, exist_ok=True)
    now = datetime.now(timezone.utc)
    table = pa.Table.from_pylist(
        [
            {
                "part_id": part_id,
                "status": "done",
                "attempt": attempt,
                "n_rows": n_rows,
                "n_violations": n_violations,
                "started_at": started_at,
                "finished_at": now,
                "code_version": __version__,
            }
        ],
        schema=_ARROW_SCHEMA,
    )
    tmp = os.path.join(path, f"._tmp_{uuid.uuid4().hex}.parquet")
    final = os.path.join(path, f"part-{part_id:05d}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)  # atomic on POSIX; Iceberg snapshot commit at scale


def invalidate_partitions(path: str, part_ids: list[int]) -> None:
    """Remove the done-marks for partitions whose data changed underneath a
    finished run (snapshot diff said 'changed') so run_resumable picks them
    up again. Missing marks are fine — an 'added' partition never had one.
    Atomic per partition (unlink), same idempotence contract as commit."""
    for p in part_ids:
        mark = os.path.join(path, f"part-{int(p):05d}.parquet")
        try:
            os.remove(mark)
        except FileNotFoundError:
            pass
