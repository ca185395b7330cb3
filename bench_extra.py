"""Targeted per-query benchmark (round-6 optimization work).

bench.py is FROZEN for measurement; this file exists so individual queries
can be re-timed quickly while optimizing, with the same methodology
(same session config, untimed warm-up, noop-sink materialization,
clearCache between queries).

Usage:
  python3 bench_extra.py q61_resume_verdicts q95_incremental_revalidation
  BENCH_X_TRIALS=3 python3 bench_extra.py q65_dedup_clusters
  python3 bench_extra.py --all            # every query, one trial

Prints one JSON line per query: {"name": ..., "trials": [...], "min": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
TRIALS = int(os.environ.get("BENCH_X_TRIALS", "1"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry_mod
    from baskerville_spark.session import get_session

    spark = get_session(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    if len(sys.argv) > 1 and sys.argv[1] == "--all":
        names = list(qs)
    else:
        names = sys.argv[1:]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    # untimed warm-up (JVM C2 + python-worker spawn), same as bench.py
    first = next(iter(qs.values()))
    _materialize(first(spark, SF_DIR))
    spark.catalog.clearCache()

    for name in names:
        fn = qs[name]
        trials = []
        for _ in range(TRIALS):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            _materialize(fn(spark, SF_DIR))
            trials.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "trials": trials,
                    "min": min(trials),
                    "loadavg": round(os.getloadavg()[0], 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
