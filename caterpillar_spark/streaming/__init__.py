from caterpillar_spark.streaming.incremental import (
    append_batch,
    compact_statistics,
    start_incremental_index,
)
from caterpillar_spark.streaming.stateful import (
    first_seen,
    windowed_event_counts,
)
from caterpillar_spark.streaming.linkstream import (
    append_link_batch,
    merged_link_edges,
    start_link_stream,
    compact_link_edges,
)

__all__ = [
    "append_batch",
    "compact_statistics",
    "start_incremental_index",
    "first_seen",
    "windowed_event_counts",
    "append_link_batch",
    "merged_link_edges",
    "start_link_stream",
    "compact_link_edges",
]
