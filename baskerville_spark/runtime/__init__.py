from baskerville_spark.runtime.manifest import (  # noqa: F401
    commit_partition,
    done_partitions,
    read_manifest,
)
from baskerville_spark.runtime.runner import (  # noqa: F401
    ValidationConfig,
    ValidationResult,
    run_validation,
    run_resumable,
)
