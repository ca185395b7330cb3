"""Checkpoint manifest + resumable runner (Runtime-ledger parity:
reference db/models.py:41-75 / base_spark.py:567-579, per-partition and
idempotent here)."""

from __future__ import annotations

from datetime import datetime, timezone

from baskerville_spark.generator import GenConfig, write_clips, write_transcript_ref
from baskerville_spark.runtime.manifest import commit_partition, done_partitions
from baskerville_spark.runtime.runner import ValidationConfig, run_resumable

CFG = GenConfig(n_rows=400, n_parts=4)


def _paths(tmp_path):
    return (
        str(tmp_path / "clips"),
        str(tmp_path / "tref"),
        str(tmp_path / "manifest"),
        str(tmp_path / "out"),
    )


def test_resume_skips_done_partitions(spark, tmp_path):
    clips_p, tref_p, man_p, out_p = _paths(tmp_path)
    write_clips(spark, clips_p, CFG)
    write_transcript_ref(spark, tref_p, CFG)

    # pretend partitions 0 and 2 already finished (killed-job scenario)
    now = datetime.now(timezone.utc)
    commit_partition(man_p, 0, 100, 0, now)
    commit_partition(man_p, 2, 100, 5, now)

    processed = run_resumable(
        spark, clips_p, man_p, out_p, tref_p, cfg=ValidationConfig(check_audio=False)
    )
    assert processed == [1, 3]
    assert done_partitions(spark, man_p) == {0, 1, 2, 3}

    # idempotent: nothing pending on re-run
    assert run_resumable(
        spark, clips_p, man_p, out_p, tref_p, cfg=ValidationConfig(check_audio=False)
    ) == []


def test_fresh_run_processes_all(spark, tmp_path):
    clips_p, tref_p, man_p, out_p = _paths(tmp_path)
    write_clips(spark, clips_p, CFG)
    write_transcript_ref(spark, tref_p, CFG)
    processed = run_resumable(
        spark, clips_p, man_p, out_p, tref_p, cfg=ValidationConfig(check_audio=False)
    )
    assert processed == [0, 1, 2, 3]
    verdicts = spark.read.parquet(f"{out_p}/verdicts")
    assert verdicts.where("part_id = 0").count() > 0
    m = done_partitions(spark, man_p)
    assert m == {0, 1, 2, 3}


def test_retry_replaces_not_duplicates(spark, tmp_path):
    """Crash between output writes and manifest commit: the retried
    partition's output rows must be REPLACED (dynamic partition overwrite),
    never appended twice."""
    import os

    clips_p, tref_p, man_p, out_p = _paths(tmp_path)
    write_clips(spark, clips_p, CFG)
    write_transcript_ref(spark, tref_p, CFG)
    run_resumable(spark, clips_p, man_p, out_p, tref_p,
                  cfg=ValidationConfig(check_audio=False))
    v1 = spark.read.parquet(f"{out_p}/verdicts").count()
    s1 = spark.read.parquet(f"{out_p}/stats").count()

    # simulate the crash: partition 1's outputs are on disk but its
    # manifest commit never happened
    os.remove(f"{man_p}/part-00001.parquet")
    assert run_resumable(spark, clips_p, man_p, out_p, tref_p,
                         cfg=ValidationConfig(check_audio=False)) == [1]

    assert spark.read.parquet(f"{out_p}/verdicts").count() == v1
    assert spark.read.parquet(f"{out_p}/stats").count() == s1
    assert done_partitions(spark, man_p) == {0, 1, 2, 3}


def test_recommit_overwrites(tmp_path, spark):
    man_p = str(tmp_path / "m")
    now = datetime.now(timezone.utc)
    commit_partition(man_p, 7, 10, 1, now, attempt=1)
    commit_partition(man_p, 7, 10, 1, now, attempt=2)  # retry same partition
    rows = spark.read.parquet(man_p).where("part_id = 7").collect()
    assert len(rows) == 1 and rows[0]["attempt"] == 2


def test_route_quarantine_partitions_input(spark):
    from pyspark.sql import Row

    from baskerville_spark.runtime.runner import route_quarantine

    clips = spark.createDataFrame(
        [
            Row(part_id=0, clip_id="a", codec="flac"),
            Row(part_id=0, clip_id="dup", codec="flac"),
            Row(part_id=0, clip_id="dup", codec="flac"),  # both copies route out
            Row(part_id=0, clip_id="ok", codec="flac"),
            Row(part_id=1, clip_id="a", codec="flac"),    # same id, other part: clean
        ]
    )
    violations = spark.createDataFrame(
        [
            Row(part_id=0, clip_id="a", check_name="snr", detail=""),
            Row(part_id=0, clip_id="a", check_name="decode_error", detail=""),
            Row(part_id=0, clip_id="a", check_name="snr", detail="again"),
            Row(part_id=0, clip_id="dup", check_name="uniqueness", detail=""),
        ]
    )
    clean, quar = route_quarantine(clips, violations)
    clean_rows = clean.collect()
    quar_rows = quar.collect()
    assert len(clean_rows) + len(quar_rows) == 5     # exact partition of input
    assert sorted((r.part_id, r.clip_id) for r in clean_rows) == [
        (0, "ok"), (1, "a"),
    ]
    by_id = {(r.part_id, r.clip_id): r for r in quar_rows}
    assert list(by_id[(0, "a")]["reasons"]) == ["decode_error", "snr"]  # deduped, sorted
    assert sum(1 for r in quar_rows if r.clip_id == "dup") == 2


def test_states_fold_across_interrupted_runs(spark, tmp_path):
    """emit_states: per-partition mergeable state rows written by TWO
    separate resumable runs fold (table_stats_from_states) to exactly the
    stats of one full scan — settled partitions are never rescanned."""
    import pyspark.sql.functions as F

    from baskerville_spark.runtime.runner import table_stats_from_states

    clips_p, tref_p, man_p, out_p = _paths(tmp_path)
    write_clips(spark, clips_p, CFG)
    cfg = ValidationConfig(
        check_audio=False,
        emit_states=True,
        state_hist_edges={"dur_ms": [500.0, 1500.0, 3000.0]},
    )
    now = datetime.now(timezone.utc)
    commit_partition(man_p, 2, 0, 0, now)
    commit_partition(man_p, 3, 0, 0, now)
    assert run_resumable(spark, clips_p, man_p, out_p, cfg=cfg) == [0, 1]
    import os
    for p in (2, 3):
        os.remove(os.path.join(man_p, f"part-{p:05d}.parquet"))
    assert run_resumable(spark, clips_p, man_p, out_p, cfg=cfg) == [2, 3]

    got = table_stats_from_states(spark, out_p, cfg).collect()[0]
    clips = spark.read.parquet(clips_p)
    exp = clips.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("sr_hz").alias("sr_min"), F.max("sr_hz").alias("sr_max"),
        F.sum("sr_hz").alias("sr_sum"),
        F.count("dur_ms").alias("dur_n"), F.min("dur_ms").alias("dur_min"),
        F.max("dur_ms").alias("dur_max"), F.sum("dur_ms").alias("dur_sum"),
        F.countDistinct("clip_id").alias("nd"),
    ).collect()[0]
    assert got["n_rows"] == exp["n_rows"]
    assert got["sr_hz_min"] == exp["sr_min"]
    assert got["sr_hz_max"] == exp["sr_max"]
    assert got["sr_hz_sum"] == exp["sr_sum"]
    assert (got["dur_ms_n"], got["dur_ms_min"], got["dur_ms_max"],
            got["dur_ms_sum"]) == (
        exp["dur_n"], exp["dur_min"], exp["dur_max"], exp["dur_sum"])
    assert sum(got["dur_ms_hist"]) == exp["dur_n"]
    assert abs(got["clip_id_distinct_est"] - exp["nd"]) <= 0.1 * exp["nd"]


def test_audio_states_fold_and_single_decode(spark, tmp_path):
    """emit_audio_states: per-partition decode states from two interrupted
    runs fold to the one-pass state of the whole table; when the invariant
    check is on, the state rides its decode pass (no second payload scan)."""
    import pyspark.sql.functions as F

    from baskerville_spark.checks import audio_state as AS

    clips_p, tref_p, man_p, out_p = _paths(tmp_path)
    write_clips(spark, clips_p, CFG)
    write_transcript_ref(spark, tref_p, CFG)
    cfg = ValidationConfig(emit_audio_states=True)  # check_audio default on
    now = datetime.now(timezone.utc)
    commit_partition(man_p, 2, 0, 0, now)
    commit_partition(man_p, 3, 0, 0, now)
    assert run_resumable(spark, clips_p, man_p, out_p, tref_p, cfg=cfg) == [0, 1]
    import os
    for p in (2, 3):
        os.remove(os.path.join(man_p, f"part-{p:05d}.parquet"))
    assert run_resumable(spark, clips_p, man_p, out_p, tref_p, cfg=cfg) == [2, 3]

    folded = {
        r["part_id"]: r
        for r in AS.merge_decode_states(
            spark.read.parquet(f"{out_p}/audio_states")
        ).collect()
    }
    direct = {
        r["part_id"]: r
        for r in AS.decode_state(spark.read.parquet(clips_p)).collect()
    }
    assert set(folded) == set(direct) == {0, 1, 2, 3}
    for p in direct:
        for f in ("n_clips", "n_decoded", "n_failed", "total_samples",
                  "clipped_samples", "sum_abs"):
            assert folded[p][f] == direct[p][f], (p, f)
