"""Query engine: boolean retrieval, TF-IDF/BM25 scoring, top-k, composition."""

from caterpillar_spark.query.engine import (
    MemoryIndex,
    search,
    search_many,
    filter_frames,
    filter_metadata,
)
from caterpillar_spark.query.composition import (
    match_all,
    match_any,
    exclude,
    boost,
    score_and_rank,
)

__all__ = [
    "MemoryIndex",
    "search",
    "search_many",
    "filter_frames",
    "filter_metadata",
    "match_all",
    "match_any",
    "exclude",
    "boost",
    "score_and_rank",
]
