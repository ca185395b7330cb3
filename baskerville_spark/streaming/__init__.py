from baskerville_spark.streaming.stateful import incremental_group_stats  # noqa: F401
