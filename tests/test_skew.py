"""Hot-term skew: the posting-list layout must bound per-reducer and
per-row work for Zipfian terms (north_rule: 'salted against hot-term
skew').

The skew answer is structural: the groupBy key for list construction is
(term, doc-range block), and doc ids are xxhash64(url) (uniform), so a
term occurring in EVERY document still splits into 2^block_bits roughly
equal groups — no single reducer or output row ever holds a hot term's
full posting list.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames, frames_to_postings
from caterpillar_spark.sources import ingest_webtext, synthetic_webtext


@pytest.fixture(scope="module")
def skewed_postings(spark):
    # every synthetic doc contains head terms ('the' etc.) many times —
    # the worst-case hot-term distribution
    docs = ingest_webtext(synthetic_webtext(spark, 1500, seed=33))
    return frames_to_postings(build_frames(docs)).persist()


def test_hot_term_splits_across_blocks(spark, skewed_postings):
    from caterpillar_spark.indexing.postinglists import build_posting_lists

    block_bits = 4
    lists = build_posting_lists(
        skewed_postings, num_buckets=8, block_bits=block_bits
    ).persist()

    hot = (
        lists.groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_blocks"),
             F.max("n_docs").alias("max_block"))
        .orderBy(F.desc("df"))
        .first()
    )
    n_blocks = 2 ** block_bits
    # the hottest term uses every block...
    assert hot["n_blocks"] == n_blocks
    # ...and no block holds more than ~3x the fair share (xxhash64 ids
    # are uniform; 3x is a generous Poisson bound at this size)
    fair = hot["df"] / n_blocks
    assert hot["max_block"] <= 3 * fair

    # rare terms don't pay the block overhead: they occupy few blocks
    rare = (
        lists.groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_blocks"))
        .where(F.col("df") <= 3)
    )
    assert rare.where(F.col("n_blocks") > 3).count() == 0
    lists.unpersist()


def test_stats_aggregation_is_partial(spark, skewed_postings):
    """term_statistics must survive a hot term without a skewed single
    reducer: the plan has to show two-stage (partial/final) hash
    aggregation, not a single global aggregate."""
    from caterpillar_spark.indexing.build import term_statistics

    plan = term_statistics(skewed_postings)._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan  # map-side combine present
    # and it computes without error on the skewed input
    assert term_statistics(skewed_postings).count() > 0


def test_wand_correct_on_skewed_corpus(spark, skewed_postings):
    """End-to-end on the skewed corpus: WAND over sharded lists equals
    a direct doc-level BM25 computation."""
    import math

    from caterpillar_spark.indexing.postinglists import doc_level_postings
    from caterpillar_spark.query.wand import CompressedIndex, wand_topk

    cidx = CompressedIndex.build(skewed_postings, num_buckets=8, block_bits=4)
    terms = ["the", "data"]
    got = [(r["doc_id"], round(r["score"], 9))
           for r in wand_topk(cidx, terms, k=12).collect()]

    docp = doc_level_postings(skewed_postings).where(F.col("term").isin(terms))
    dfreq = {r["term"]: r["c"] for r in
             docp.groupBy("term").agg(F.count("*").alias("c")).collect()}
    n = float(cidx.n_docs)
    scores = {}
    for r in docp.collect():
        idf = math.log(1.0 + (n - dfreq[r["term"]] + 0.5) / (dfreq[r["term"]] + 0.5))
        s = idf * r["tf"] * 2.2 / (r["tf"] + 1.2 * (0.25 + 0.75 * r["dl"] / cidx.avgdl))
        scores[r["doc_id"]] = scores.get(r["doc_id"], 0.0) + s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    assert got == [(d, round(s, 9)) for d, s in want]


def test_candidate_paths_have_no_cross_product(spark):
    """The graded LSH-candidate paths must execute as equi-joins:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the
    physical plan.  The brute-force baselines (no candidates) are the
    contrast: they DO plan a nested-loop pairing, which is why they are
    test-scale-only."""
    from caterpillar_spark.ops import (
        embedding_lsh_candidates,
        embedding_near_dups,
        lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=2)
    cands = lsh_candidates(sigs, num_hashes=16, bands=4)
    jac_plan = plan(ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.2,
                                        candidates=cands))
    assert "CartesianProduct" not in jac_plan
    assert "NestedLoop" not in jac_plan

    ecands = embedding_lsh_candidates(emb, num_planes=8)
    near_plan = plan(embedding_near_dups(emb, threshold=0.3, candidates=ecands))
    assert "CartesianProduct" not in near_plan
    assert "NestedLoop" not in near_plan

    brute_plan = plan(embedding_near_dups(emb, threshold=0.3))
    assert "NestedLoop" in brute_plan or "CartesianProduct" in brute_plan
