"""Facet counts over boolean-retrieval matches (Solr/Elasticsearch-style).

Beyond-reference serving surface: for a query, the per-value match
counts of one or more metadata fields — the sidebar a search UI renders
next to results.  The reference exposes metadata values only via full
inversion (query/vectors.metadata_inversion); faceting restricted to a
query's match set is new.

Scale shape: the match relation (all qualifying units, not top-k) joins
the metadata relation on the unit key, then ONE explode of a
field→value map feeds ONE partial-aggregated groupBy (field, value) —
so F facet fields cost one shuffle total, not F.  Facet cardinality is
bounded by the fields' value domains, and the map-side combine keeps
the shuffle linear in matches, not values×matches.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["facet_counts", "facet_ranges"]


def _meta_relation(index) -> DataFrame:
    if hasattr(index, "frames"):
        return index.frames
    if hasattr(index, "stored_documents"):
        return index.stored_documents()
    raise TypeError(
        f"no metadata relation on {type(index).__name__}; pass meta="
    )


def facet_counts(
    index,
    fields: Sequence[str],
    meta: Optional[DataFrame] = None,
    unit: str = "document",
    **query_kw,
) -> DataFrame:
    """Per-value match counts for ``fields`` over the query's match
    set: ``(field, value, n)``, values stringified (mixed-type fields
    share one relation; numeric facets keep their natural string form).

    ``meta`` overrides the metadata relation (defaults to the index's
    frames / stored documents); it must carry the unit key columns and
    every facet field.  ``query_kw`` is any :func:`filter_frames` spec
    (must/should/at_least_n/must_not/metadata/fields/scorer).
    """
    from caterpillar_spark.query.engine import filter_frames

    if not fields:
        raise ValueError("need at least one facet field")
    matches = filter_frames(index, unit=unit, **query_kw)
    keys = [c for c in matches.columns if c != "score"]
    src = meta if meta is not None else _meta_relation(index)
    missing = [c for c in [*keys, *fields] if c not in src.columns]
    if missing:
        raise ValueError(f"metadata relation lacks columns {missing}")
    src = src.select(*keys, *fields).dropDuplicates(keys)
    kv = []
    for f in fields:
        kv.extend([F.lit(f), F.col(f).cast("string")])
    return (
        matches.select(*keys)
        .join(src, keys)
        .select(F.explode(F.create_map(*kv)).alias("field", "value"))
        .groupBy("field", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def facet_ranges(
    index,
    field: str,
    width: float,
    meta: Optional[DataFrame] = None,
    unit: str = "document",
    **query_kw,
) -> DataFrame:
    """Range (histogram) facet over a NUMERIC metadata field: match
    counts per fixed-width bucket, ``(bucket_start, bucket_end, n)``
    with ``bucket_start = floor(value / width) * width`` — the
    search-UI numeric sidebar (price/length/date-ordinal ranges).

    Same scale shape as :func:`facet_counts`: match set ⋈ metadata,
    one partial-aggregated groupBy on the bucket key; output
    cardinality = value range / width.  Null field values are dropped
    (they have no bucket).
    """
    from caterpillar_spark.query.engine import filter_frames

    if width <= 0:
        raise ValueError("width must be positive")
    matches = filter_frames(index, unit=unit, **query_kw)
    keys = [c for c in matches.columns if c != "score"]
    src = meta if meta is not None else _meta_relation(index)
    missing = [c for c in [*keys, field] if c not in src.columns]
    if missing:
        raise ValueError(f"metadata relation lacks columns {missing}")
    src = src.select(*keys, field).dropDuplicates(keys)
    start = (
        F.floor(F.col(field).cast("double") / F.lit(float(width)))
        * F.lit(float(width))
    )
    return (
        matches.select(*keys)
        .join(src, keys)
        .where(F.col(field).isNotNull())
        .select(start.alias("bucket_start"))
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket_start",
            (F.col("bucket_start") + F.lit(float(width))).alias("bucket_end"),
            "n",
        )
    )
