"""Drift checks: PSI/KS self-zero, drifted-partition detection, thresholds."""

from __future__ import annotations

from baskerville_spark.checks.drift import (
    capture_baseline,
    drift_verdicts,
    psi_py,
)


def test_psi_self_is_zero():
    p = [0.1, 0.2, 0.3, 0.4]
    assert psi_py(p, p) == 0.0


def test_baseline_self_drift_zero(spark, t1_clips):
    clean = t1_clips.where("part_id = 0")
    rows = capture_baseline(clean, ["sr_hz", "dur_ms"], ["codec"])
    v = drift_verdicts(clean, rows).collect()
    assert all(r["passed"] for r in v)
    for r in v:
        assert abs(r["metric_value"]) < 1e-9


def test_drift_partition_flagged(spark, t1_clips, t1_cfg):
    clean = t1_clips.where("part_id = 0")
    rows = capture_baseline(clean, ["sr_hz", "dur_ms"], ["codec"])
    v = drift_verdicts(t1_clips, rows).collect()
    drift_part = t1_cfg.n_parts - 1
    # drifted partition: sr_hz distribution shifted + unseen 'mp3' codec
    sr_psi = {r["part_id"]: r for r in v if r["check_name"] == "psi:sr_hz"}
    codec_psi = {r["part_id"]: r for r in v if r["check_name"] == "psi:codec"}
    assert not sr_psi[drift_part]["passed"]
    assert not codec_psi[drift_part]["passed"]
    assert sr_psi[0]["passed"] and codec_psi[0]["passed"]
    # middle partitions share the clean distribution
    assert sr_psi[1]["passed"] and sr_psi[2]["passed"]
    # KS flags the numeric shift too
    sr_ks = {r["part_id"]: r for r in v if r["check_name"] == "ks:sr_hz"}
    assert not sr_ks[drift_part]["passed"] and sr_ks[1]["passed"]


def test_baseline_roundtrip(spark, t1_clips, tmp_path):
    from baskerville_spark.checks.drift import load_baseline, save_baseline

    clean = t1_clips.where("part_id = 0")
    rows = capture_baseline(clean, ["sr_hz"], ["codec"])
    save_baseline(spark, rows, str(tmp_path / "baseline"))
    loaded = load_baseline(spark, str(tmp_path / "baseline"))
    by_col = {r["column_name"]: r for r in loaded}
    orig = {r["column_name"]: r for r in rows}
    for c in orig:
        assert list(by_col[c]["bin_fractions"]) == list(orig[c]["bin_fractions"])
