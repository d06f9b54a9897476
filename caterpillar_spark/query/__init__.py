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
from caterpillar_spark.query.expand import (
    fuzzy_terms,
    fuzzy_search,
    prefix_terms,
    prefix_search,
    suggest,
)
from caterpillar_spark.query.facets import facet_counts
from caterpillar_spark.query.highlight import highlight_search, term_occurrences
from caterpillar_spark.query.mlt import more_like_this
from caterpillar_spark.query.parser import (
    execute_many,
    execute_many_wand,
    execute_query,
    execute_query_wand,
    parse_query,
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
    "fuzzy_terms",
    "fuzzy_search",
    "prefix_terms",
    "prefix_search",
    "suggest",
    "facet_counts",
    "highlight_search",
    "term_occurrences",
    "more_like_this",
    "execute_many",
    "execute_many_wand",
    "execute_query",
    "execute_query_wand",
    "parse_query",
]
