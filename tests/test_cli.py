"""CLI (spark-submit entry) smoke: generate → baseline → validate via
main(argv), in-process (getOrCreate reuses the test session)."""

from __future__ import annotations

import json

from baskerville_spark.main import main


def test_cli_generate_baseline_validate(spark, tmp_path, capsys):
    out = str(tmp_path)
    assert main([
        "generate", "--out", f"{out}/demo", "--n-rows", "400", "--n-parts", "4",
    ]) == 0
    assert main([
        "baseline", "--clips", f"{out}/demo/clips", "--out", f"{out}/baseline",
    ]) == 0
    assert main([
        "validate",
        "--clips", f"{out}/demo/clips",
        "--transcripts", f"{out}/demo/tref",
        "--baseline", f"{out}/baseline",
        "--manifest", f"{out}/manifest",
        "--out", f"{out}/results",
        "--skip-audio",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    report = json.loads(lines[-1])
    assert report["partitions_processed"] == [0, 1, 2, 3]
    assert report["rows"] == 400

    verdicts = spark.read.parquet(f"{out}/results/verdicts")
    assert verdicts.where("part_id = 0").count() > 0

    # second invocation: resumable — nothing pending
    assert main([
        "validate",
        "--clips", f"{out}/demo/clips",
        "--manifest", f"{out}/manifest",
        "--out", f"{out}/results",
        "--skip-audio",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert json.loads(lines[-1])["partitions_processed"] == []
