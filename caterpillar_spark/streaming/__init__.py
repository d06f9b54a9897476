from caterpillar_spark.streaming.incremental import (
    append_batch,
    compact_statistics,
    start_incremental_index,
)

__all__ = ["append_batch", "compact_statistics", "start_incremental_index"]
