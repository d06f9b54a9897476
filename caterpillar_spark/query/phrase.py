"""Phrase / n-gram search over the COMPRESSED positions layout.

The r3 verdict's gap #4: positional queries (``search_ngrams``,
reference storage/sqlite.py:996-1047) ran over the raw postings parquet
— correct, but a second, uncompressed layout to scan at 100 TB.  This
module runs the same exact-adjacency semantics over
``POSITION_LIST_SCHEMA`` rows (indexing/postinglists.py): delta+varint
position streams in doc-range blocks aligned with the WAND layout.

Execution shape (mirrors query/wand.py):

1. position rows for the query terms are read with term-bucket
   partition pruning + a literal term predicate (term-sorted files ->
   parquet row-group pruning);
2. rows hash-repartition by ``block`` — blocks are doc-range aligned
   across terms, so every frame's data for all query terms lands in one
   task;
3. inside ``mapPartitions`` each task decodes the terms' frame/position
   streams (numpy varint decode, one pass per row) and chains the
   adjacency intersection: positions p of term_0 survive iff term_i has
   p+i in the same (doc, field, frame) — exact int positions, no
   mod-63 bitmap cap (documented deviation from the reference).

Result: (doc_id, field, frame_seq, matches) — identical to the
DataFrame engine's :func:`caterpillar_spark.query.analytics
.search_ngram` relation (plus the field column), pinned by pytest.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from pyspark.sql import DataFrame, functions as F

from caterpillar_spark.indexing.postinglists import decode_position_row


def prune_position_lists(
    pos_lists: DataFrame,
    terms: Sequence[str],
    num_buckets: Optional[int] = None,
) -> DataFrame:
    """Bucket-pruned + term-filtered scan of the positions table
    (buckets computed driver-side — no pre-job, same as WAND)."""
    df = pos_lists
    if num_buckets and "term_bucket" in df.columns:
        from caterpillar_spark.functions.hashing import spark_xxhash64

        buckets = sorted({spark_xxhash64(t) % num_buckets for t in terms})
        df = df.where(F.col("term_bucket").isin(buckets))
    return df.where(F.col("term").isin(list(terms)))


def search_ngram_compressed(
    pos_lists: DataFrame,
    terms: Sequence[str],
    num_buckets: Optional[int] = None,
    block_bits: Optional[int] = None,
    num_partitions: Optional[int] = None,
    doc_lists: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-frame match counts of an exact n-gram over the compressed
    positions layout.  Returns (doc_id, field, frame_seq, matches).

    ``doc_lists`` (optional, the POSTING_LIST_SCHEMA relation) turns on
    **hot-term pruning**: the terms' doc-gap lists — far cheaper to
    decode than position streams (one vectorized cumsum, no per-frame
    walk) — co-shuffle with the position rows on the same ``block``
    key, each task intersects them per block (np.intersect1d chain),
    and position streams materialize arrays only for surviving docs.
    A phrase of two stopword-grade terms then pays for the
    INTERSECTION of their lists (usually tiny) rather than decoding
    the union (≈2 full hot lists).  Blocks where any term is absent or
    the intersection is empty never touch position data at all.
    Without ``doc_lists`` the behavior is the original full decode."""
    if len(terms) < 2:
        raise ValueError("n-gram needs at least 2 terms")
    terms = list(terms)
    spark = pos_lists.sparkSession
    pruned = prune_position_lists(pos_lists, terms, num_buckets)

    needed = ["term", "block", "field", "n_frames", "first_doc", "data"]
    rows = pruned.select(F.lit(1).alias("kind"), *needed)
    prune_docs = doc_lists is not None
    if prune_docs:
        dl = prune_position_lists(doc_lists, terms, num_buckets)
        rows = dl.select(
            F.lit(0).alias("kind"),
            "term",
            "block",
            F.lit(None).cast("string").alias("field"),
            F.col("n_docs").alias("n_frames"),
            "first_doc",
            F.col("doc_gaps").alias("data"),
        ).unionByName(rows)
    parts = num_partitions or spark.sparkContext.defaultParallelism
    if block_bits:
        parts = min(parts, 2 ** block_bits)
    rows = rows.repartition(parts, "block").sortWithinPartitions("block")

    n_terms = len(set(terms))
    uniq_terms = sorted(set(terms))

    def match_partition(it: Iterator) -> Iterator[tuple]:
        from caterpillar_spark.indexing.codec import decode_doc_gaps
        from caterpillar_spark.indexing.postinglists import (
            decode_position_row_filtered,
        )

        # kind=0 rows: block -> term -> [doc-list rows] (cheap decode)
        doc_rows: dict = {}
        pos_rows: list = []
        for r in it:
            if r["kind"] == 0:
                doc_rows.setdefault(r["block"], {}).setdefault(
                    r["term"], []
                ).append(r)
            else:
                pos_rows.append(r)

        survivors: dict = {}
        if prune_docs:
            for block, tmap in doc_rows.items():
                if len(tmap) < n_terms:
                    continue  # a query term absent from this doc range
                inter = None
                for t in uniq_terms:
                    parts_t = [
                        decode_doc_gaps(rr["first_doc"], rr["data"], rr["n_frames"])
                        for rr in tmap[t]
                    ]
                    a = parts_t[0] if len(parts_t) == 1 else np.concatenate(parts_t)
                    inter = a if inter is None else np.intersect1d(inter, a)
                    if inter.size == 0:
                        break
                if inter is not None and inter.size:
                    survivors[block] = set(inter.tolist())

        # (block, field) -> term -> {(doc, fseq): positions}
        groups: dict = {}
        for r in pos_rows:
            if prune_docs:
                keep = survivors.get(r["block"])
                if not keep:
                    continue  # doc intersection empty: skip the stream
                decoded = decode_position_row_filtered(r, keep)
            else:
                decoded = decode_position_row(r)
            maps = groups.setdefault((r["block"], r["field"]), {})
            tmap = maps.setdefault(r["term"], {})
            for doc, fseq, pos in decoded:
                prev = tmap.get((doc, fseq))
                # appended indexes can split a frame's term across rows
                # only if re-appended (guarded against); concat defensively
                tmap[(doc, fseq)] = (
                    pos if prev is None else np.concatenate([prev, pos])
                )
        for (block, field), maps in groups.items():
            if len(maps) < n_terms:
                continue  # a query term absent from this doc range
            base = maps[terms[0]]
            for key, pos in base.items():
                ok = pos
                for offset in range(1, len(terms)):
                    other = maps[terms[offset]].get(key)
                    if other is None:
                        ok = None
                        break
                    ok = ok[np.isin(ok + offset, other)]
                    if ok.size == 0:
                        ok = None
                        break
                if ok is not None and ok.size:
                    yield (key[0], field, key[1], int(ok.size))

    out = spark.createDataFrame(
        rows.rdd.mapPartitions(match_partition),
        "doc_id long, field string, frame_seq int, matches int",
    )
    return out


def search_ngram_index(index, terms: Sequence[str]) -> DataFrame:
    """Phrase search over a persisted
    :class:`caterpillar_spark.indexing.build.InvertedIndex` that was
    built ``with_positions=True`` — partition-pruned scan of its
    ``positions/`` table, with hot-term doc-intersection pruning
    driven by the index's compressed doc-gap ``lists/`` (always
    present on a persisted index)."""
    m = index.manifest
    return search_ngram_compressed(
        index.position_lists(),
        terms,
        num_buckets=m.get("num_buckets"),
        block_bits=m.get("block_bits"),
        doc_lists=index.lists(),
    )
