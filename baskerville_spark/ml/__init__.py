from baskerville_spark.ml.iforest import (  # noqa: F401
    IsolationForest,
    score_anomalies,
    top_anomalies,
    train_iforest,
)
