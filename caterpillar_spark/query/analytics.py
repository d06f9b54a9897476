"""Corpus analytics over the index: term associations, significant
bigram discovery, positional n-gram search, case-fold suggestions.

Semantics spec:

* associations — term co-occurrence counted once per frame pair
  (reference "associations index", index.py:23-30; computed by a
  postings self-join, sqlite.py:672-755);
* bigram discovery — adjacent-position pairs scored with the
  Mikolov-style significance ``freq(a,b) * vocab / (freq(a)*freq(b))``
  (reference sqlite.py:1554-1636);
* positional adjacency uses EXACT integer position arrays.  DEVIATION
  (documented): the reference packs positions into lossy 63-bit bitmaps
  (sqlite.py:1703-1725) and misses matches beyond position 62; we have
  no such cap.
* case-fold suggestions — merge ``word``/``Word`` variants when the
  lesser-cased frequency ratio exceeds 0.7 (reference
  index.py:1009-1039).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def associations(
    postings: DataFrame,
    term: Optional[str] = None,
    min_count: int = 1,
) -> DataFrame:
    """Co-occurrence counts per unordered term pair (once per frame).

    With ``term`` given, only that term's associations are returned and
    the self-join's left side collapses to the term's posting list —
    broadcastable for all but stopword-grade terms.
    """
    left = postings.select("doc_id", "frame_seq", F.col("term").alias("term_a"))
    if term is not None:
        left = left.where(F.col("term_a") == term)
        left = F.broadcast(left)
    right = postings.select("doc_id", "frame_seq", F.col("term").alias("term_b"))
    pairs = left.join(right, ["doc_id", "frame_seq"]).where(
        F.col("term_a") != F.col("term_b")
    )
    out = pairs.groupBy("term_a", "term_b").agg(F.count(F.lit(1)).alias("n_frames"))
    return out.where(F.col("n_frames") >= min_count)


def adjacent_pairs(postings: DataFrame) -> DataFrame:
    """Frame-level counts of positionally adjacent term pairs
    (term_a at position p, term_b at p+1) via a postings self-join on
    the frame key + an ``exists`` adjacency test over exact positions."""
    a = postings.select(
        "doc_id", "frame_seq", F.col("term").alias("term_a"),
        F.col("positions").alias("pos_a"),
    )
    b = postings.select(
        "doc_id", "frame_seq", F.col("term").alias("term_b"),
        F.col("positions").alias("pos_b"),
    )
    joined = a.join(b, ["doc_id", "frame_seq"])
    adjacent = F.exists(
        "pos_a",
        lambda p: F.exists("pos_b", lambda q: q == p + 1),
    )
    return (
        joined.where(adjacent)
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )


def significant_bigrams(
    postings: DataFrame,
    min_count: int = 5,
    threshold: float = 40.0,
) -> DataFrame:
    """Mikolov/Gensim-style significant-bigram discovery
    (reference sqlite.py:1554-1636):

    ``score(a,b) = n_frames(a,b) * vocab_size / (ff(a) * ff(b))``
    where ff is frame frequency; pairs must appear in at least
    ``min_count`` frames and score above ``threshold``.
    """
    pair_counts = adjacent_pairs(postings).where(F.col("n_frames") >= min_count)
    unigram = postings.groupBy("term").agg(F.count(F.lit(1)).alias("ff"))
    vocab_size = unigram.count()
    return (
        pair_counts.join(
            unigram.withColumnRenamed("term", "term_a").withColumnRenamed("ff", "ff_a"),
            "term_a",
        )
        .join(
            unigram.withColumnRenamed("term", "term_b").withColumnRenamed("ff", "ff_b"),
            "term_b",
        )
        .select(
            "term_a",
            "term_b",
            "n_frames",
            F.round(
                F.col("n_frames") * F.lit(float(vocab_size))
                / (F.col("ff_a") * F.col("ff_b")),
                6,
            ).alias("significance"),
        )
        .where(F.col("significance") > threshold)
    )


def search_ngram(postings: DataFrame, terms: list) -> DataFrame:
    """Per-frame match counts of an exact n-gram (consecutive
    positions), reference ``search_ngrams`` (sqlite.py:996-1047) with
    exact arrays instead of bitmaps.

    Returns (doc_id, frame_seq, matches).
    """
    if len(terms) < 2:
        raise ValueError("n-gram needs at least 2 terms")
    cur = postings.where(F.col("term") == terms[0]).select(
        "doc_id", "frame_seq", F.col("positions").alias("pos")
    )
    def _advance(offset: int):
        # single-arg lambda (a 2-arg lambda would be interpreted by
        # Spark's higher-order filter as (element, index))
        return lambda p: F.exists(
            f"pos_{offset}", lambda q: q == p + offset
        )

    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.where(F.col("term") == t).select(
            "doc_id", "frame_seq", F.col("positions").alias(f"pos_{i}")
        )
        cur = cur.join(nxt, ["doc_id", "frame_seq"]).select(
            "doc_id",
            "frame_seq",
            F.filter("pos", _advance(i)).alias("pos"),
        ).where(F.size("pos") > 0)
    return cur.select(
        "doc_id", "frame_seq", F.size("pos").alias("matches")
    )


def case_fold_terms(postings: DataFrame, ratio: float = 0.7) -> DataFrame:
    """Suggest merging case variants: for each lowercase form with
    multiple casings, emit (variant -> fold_to) when the variant's
    frequency is below ``ratio`` * the dominant casing's frequency
    (reference get_case_fold_terms, index.py:1009-1039)."""
    freqs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("ff"))
    folded = freqs.withColumn("folded", F.lower(F.col("term")))
    from pyspark.sql.window import Window

    w = Window.partitionBy("folded")
    enriched = folded.select(
        "term",
        "ff",
        "folded",
        F.max(F.struct("ff", F.col("term").alias("t"))).over(w).alias("_top"),
        F.count(F.lit(1)).over(w).alias("_variants"),
    )
    return (
        enriched.where(
            (F.col("_variants") > 1)
            & (F.col("term") != F.col("_top.t"))
            & (F.col("ff") < F.lit(ratio) * F.col("_top.ff"))
        )
        .select(
            F.col("term").alias("variant"),
            F.col("ff").alias("variant_ff"),
            F.col("_top.t").alias("fold_to"),
            F.col("_top.ff").alias("dominant_ff"),
        )
    )
