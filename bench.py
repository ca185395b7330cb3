"""Benchmark harness.

Default: runs every queries() entry from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the clip-validation throughput benchmark,
and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "clips_per_sec": ...}

--scaling: runs the validation job at two parallelism levels (local[8] vs
local[32] — standing in for N and 4N executors per BASELINE.md) in separate
processes and prints throughput at both + scaling efficiency.

--clips-only N: internal mode used by --scaling subprocesses.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
BENCH_CLIPS = int(os.environ.get("BENCH_CLIPS", "20000"))
BENCH_PARTS = int(os.environ.get("BENCH_PARTS", "16"))


def _materialize(df) -> int:
    """Force full execution without driver-side transfer (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def clip_throughput(spark, n_clips: int, n_parts: int) -> dict:
    """Validated clips/sec over a freshly written parquet clip table.

    Generation + parquet write is excluded from the timed window; the timed
    window is the full check suite (stats, uniqueness, RI, drift, audio
    invariant) reading from disk — the production shape.
    """
    from baskerville_spark.checks.drift import capture_baseline
    from baskerville_spark.generator import (
        GenConfig, write_clips, write_transcript_ref,
    )
    from baskerville_spark.runtime.runner import ValidationConfig, run_validation

    cfg = GenConfig(n_rows=n_clips, n_parts=n_parts)
    tmp = tempfile.mkdtemp(prefix="bench_clips_")
    try:
        write_clips(spark, f"{tmp}/clips", cfg)
        write_transcript_ref(spark, f"{tmp}/tref", cfg)
        clips = spark.read.parquet(f"{tmp}/clips")
        tref = spark.read.parquet(f"{tmp}/tref")
        clean = clips.where("part_id = 0")
        baseline = capture_baseline(clean, ["sr_hz", "dur_ms"], ["codec"])

        t0 = time.time()
        res = run_validation(spark, clips, tref, baseline, ValidationConfig())
        n_verdicts = res.verdicts.count()
        n_viol = res.violations.count()
        elapsed = time.time() - t0
        return {
            "n_clips": n_clips,
            "elapsed_s": round(elapsed, 3),
            "clips_per_sec": round(n_clips / elapsed, 1),
            "n_verdicts": n_verdicts,
            "n_violations": n_viol,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_default() -> None:
    import __spark_entry__ as entry_mod
    from baskerville_spark.session import get_session

    spark = get_session("bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            _materialize(df)
            el = time.time() - t0
        except Exception:  # noqa: BLE001
            el = -1.0
        per_query[name] = round(el, 3)
        if el > 0:
            total += el

    clip = clip_throughput(spark, BENCH_CLIPS, BENCH_PARTS)
    total += clip["elapsed_s"]

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "validation_suite_plus_queries_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "clips_per_sec": clip["clips_per_sec"],
                "clip_bench": clip,
                "cpus": int(CPUS),
            }
        )
    )


def run_clips_only(cpus: int) -> None:
    from baskerville_spark.session import get_session

    spark = get_session(
        f"bench-clips-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    clip = clip_throughput(spark, BENCH_CLIPS, BENCH_PARTS)
    clip["cpus"] = cpus
    print(json.dumps(clip))


def run_scaling() -> None:
    """N vs 4N cores on identical input → throughput + scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--clips-only", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            env={**os.environ, "BENCH_CLIPS": str(BENCH_CLIPS)},
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["clips_per_sec"], results[32]["clips_per_sec"]
    eff = (t32 / t8) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cores",
                "value": round(eff, 3),
                "unit": "ratio",
                "throughput_n": t8,
                "throughput_4n": t32,
                "n_clips": BENCH_CLIPS,
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--clips-only":
        run_clips_only(int(sys.argv[2]))
    else:
        run_default()
