"""Run metrics via df.observe — the reference's custom dict-summing
AccumulatorParam (src/baskerville/spark/helpers.py:47-65) and Prometheus
registry (models/metrics/registry.py) replaced by Spark's native observable
metrics: zero extra passes, collected as a side effect of the action that
materializes the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation


def observe_violations(violations: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach violation-count metrics; read obs.get AFTER an action runs."""
    obs = Observation("baskerville_run")
    observed = violations.observe(
        obs,
        F.count(F.lit(1)).alias("n_violations"),
        F.approx_count_distinct("clip_id").alias("n_violating_clips"),
        F.approx_count_distinct("check_name").alias("n_failing_checks"),
    )
    return observed, obs
