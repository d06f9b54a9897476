"""Doc-major forward index layout (indexing/build.py ``forward/``).

The reference maintains a second, frame-clustered posting copy
(`frame_posting`, /root/reference/caterpillar/storage/
_sqlite_v0_10_0_schema.py:121-142) precisely so per-document term reads
never scan the term-major index.  These tests pin the Spark restatement:
layout written at build, equal to the postings-derived truth, consumed
by MLT seed extraction and tf_vectors as bucket-pruned point reads, and
kept consistent through append / delete / optimize.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.indexing import build_index
from caterpillar_spark.query import MemoryIndex
from caterpillar_spark.query.mlt import mlt_seed_terms, more_like_this
from caterpillar_spark.query.vectors import tf_vectors, tf_vectors_index


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "rare gem rare gem common common"),
            (2, "rare gem common stuff"),
            (3, "common stuff only here"),
            (4, "totally unrelated words everywhere"),
            (95, "gem stuff gem words"),
        ],
        "doc_id long, text string",
    )
    return build_frames(docs, text_cols=["text"], frame_size=0)


@pytest.fixture(scope="module")
def built(spark, corpus):
    root = tempfile.mkdtemp(prefix="catspark_fwd_")
    idx = build_index(corpus, f"{root}/idx", num_buckets=4, with_positions=True)
    yield idx
    shutil.rmtree(root, ignore_errors=True)


def _fwd_truth(idx):
    return {
        (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
        for r in idx.postings()
        .select("doc_id", "field", "frame_seq", "term", "freq")
        .collect()
    }


def test_forward_layout_matches_postings(built):
    assert built.has_forward()
    assert built.manifest["with_forward"] is True
    got = {
        (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
        for r in built.forward().collect()
    }
    assert got == _fwd_truth(built)
    # bucket column is the driver-computable pmod
    nb = built.manifest["fwd_buckets"]
    for r in built.forward().select("fwd_bucket", "doc_id").collect():
        assert r["fwd_bucket"] == r["doc_id"] % nb


def test_doc_forward_is_bucket_pruned_point_read(built):
    rows = built.doc_forward(95).collect()
    assert {r["term"] for r in rows} == {"gem", "stuff", "words"}
    # the plan carries the partition-pruning bucket predicate, not a
    # full-layout scan
    plan = built.doc_forward(95)._jdf.queryExecution().executedPlan().toString()
    assert "fwd_bucket" in plan


def test_mlt_routes_through_forward_and_matches_memory_path(built, corpus):
    mem = MemoryIndex(corpus)
    assert mlt_seed_terms(built, 1, max_terms=3) == mlt_seed_terms(
        mem, 1, max_terms=3
    )
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in more_like_this(built, 1, max_terms=3, k=5).collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in more_like_this(mem, 1, max_terms=3, k=5).collect()
    ]
    assert got == want


def test_tf_vectors_index_uses_forward_and_matches(built):
    via_fwd = {
        (r["doc_id"], tuple((v["term"], v["freq"]) for v in r["vector"]))
        for r in tf_vectors_index(built, unit="document").collect()
    }
    via_posts = {
        (r["doc_id"], tuple((v["term"], v["freq"]) for v in r["vector"]))
        for r in tf_vectors(built.postings(), unit="document").collect()
    }
    assert via_fwd == via_posts
    only95 = tf_vectors_index(built, doc_ids=[95], unit="document").collect()
    assert [r["doc_id"] for r in only95] == [95]


def test_mlt_wand_engine_parity(built):
    """engine='wand' retrieval (compressed lists, BM25 doc scoring) is
    rank- and score-identical to the DataFrame bm25_doc path."""
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in more_like_this(built, 1, max_terms=3, k=5, engine="wand").collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in more_like_this(
            built, 1, max_terms=3, k=5, scorer="bm25_doc", unit="document"
        ).collect()
    ]
    assert got == want and got
    assert all(d != 1 for d, _ in got)


def test_forward_survives_append_delete_optimize(spark, corpus):
    from caterpillar_spark.indexing.build import delete_documents, optimize_index
    from caterpillar_spark.streaming.incremental import append_batch

    root = tempfile.mkdtemp(prefix="catspark_fwdmut_")
    try:
        idx = build_index(corpus, f"{root}/idx", num_buckets=4)
        extra = build_frames(
            spark.createDataFrame(
                [(7, "fresh gem words"), (8, "fresh stuff")],
                "doc_id long, text string",
            ),
            text_cols=["text"],
            frame_size=0,
        )
        idx = append_batch(extra, f"{root}/idx")
        assert _fwd_truth(idx) == {
            (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
            for r in idx.forward().collect()
        }
        idx = delete_documents(idx, [1, 7])
        fwd_docs = {r["doc_id"] for r in idx.forward().select("doc_id").collect()}
        assert 1 not in fwd_docs and 7 not in fwd_docs
        assert _fwd_truth(idx) == {
            (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
            for r in idx.forward().collect()
        }
        idx = optimize_index(idx)
        assert _fwd_truth(idx) == {
            (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
            for r in idx.forward().collect()
        }
        # MLT still point-reads the compacted forward layout
        assert mlt_seed_terms(idx, 95, max_terms=2)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_build_without_forward_falls_back_then_backfills(spark, corpus):
    from caterpillar_spark.indexing.build import build_forward

    root = tempfile.mkdtemp(prefix="catspark_nofwd_")
    try:
        idx = build_index(corpus, f"{root}/idx", num_buckets=4, with_forward=False)
        assert not idx.has_forward()
        # postings-scan fallback still serves MLT (rare df=2 wins; gem
        # and common tie at df=3 -> term-asc tie-break picks common)
        assert mlt_seed_terms(idx, 1, max_terms=2) == ["rare", "common"]
        # legacy-index migration: backfill, then the point-read path
        rev = idx.manifest["revision"]
        idx = build_forward(idx)
        assert idx.has_forward() and idx.manifest["revision"] == rev + 1
        assert _fwd_truth(idx) == {
            (r["doc_id"], r["field"], r["frame_seq"], r["term"], r["freq"])
            for r in idx.forward().collect()
        }
        assert mlt_seed_terms(idx, 1, max_terms=2) == ["rare", "common"]
        # idempotent no-op on re-run
        assert build_forward(idx).manifest["revision"] == rev + 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
