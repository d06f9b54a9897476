"""Index build: frames -> postings -> partitioned inverted index.

Spark-first restatement of the reference's staged-write + flush-merge
commit path (storage/sqlite.py:133-150, storage/_sqlite_scripts.py):
the in-memory staging DB becomes the shuffle, the SQL flush script
becomes groupBy aggregations, and the monotone index revision becomes a
manifest with per-partition lineage + metrics.
"""

from caterpillar_spark.indexing.build import (
    InvertedIndex,
    add_attributes,
    build_index,
    forward_rows,
    postings_with_bucket,
    term_statistics,
    field_statistics,
)

__all__ = [
    "InvertedIndex",
    "add_attributes",
    "build_index",
    "forward_rows",
    "postings_with_bucket",
    "term_statistics",
    "field_statistics",
]
