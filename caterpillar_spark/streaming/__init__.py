from caterpillar_spark.streaming.incremental import (
    append_batch,
    compact_statistics,
    start_incremental_index,
)
from caterpillar_spark.streaming.stateful import (
    first_seen,
    windowed_event_counts,
)

__all__ = [
    "append_batch",
    "compact_statistics",
    "start_incremental_index",
    "first_seen",
    "windowed_event_counts",
]
