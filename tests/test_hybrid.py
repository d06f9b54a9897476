"""RRF hybrid retrieval (ops/hybrid.py)."""

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.ops.hybrid import hybrid_topk, rrf_fuse
from caterpillar_spark.query import MemoryIndex


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (1, 0.5)], "doc_id long, cosine double"
    )
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b], k=3).collect()}
    want = {
        1: round(1 / 61 + 1 / 62, 6),  # rank 1 in a, rank 2 in b
        3: round(1 / 63 + 1 / 61, 6),  # rank 3 in a, rank 1 in b
        2: round(1 / 62, 6),           # only in a
    }
    assert got == want
    # rounded-score rank ties break by id asc, deterministically
    t = spark.createDataFrame(
        [(7, 1.0000001), (4, 1.0000002)], "doc_id long, score double"
    )
    ranked = rrf_fuse([t], k=2).collect()
    assert [r["doc_id"] for r in ranked] == [4, 7]  # equal at 6dp -> id asc


def test_rrf_fuse_rejects_bad_shapes(spark):
    with pytest.raises(ValueError, match="ranked list"):
        rrf_fuse([])
    bad = spark.createDataFrame([(1, 1.0, 2.0)], "doc_id long, a double, b double")
    with pytest.raises(ValueError, match="score"):
        rrf_fuse([bad])


def test_hybrid_topk_blends_both_signals(spark):
    docs = spark.createDataFrame(
        [
            (1, "query match rich text"),   # lexically strong
            (2, "query match"),             # lexically medium
            (3, "nothing relevant"),        # semantic-only candidate
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.7, 0.7]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = MemoryIndex(build_frames(docs, text_cols=["text"], frame_size=0))
    got = hybrid_topk(
        idx, emb, ["query", "match"], [1.0, 0.0], k=3, depth=3
    ).collect()
    ids = [r["doc_id"] for r in got]
    # doc 2 is rank-1 lexically (same tf as doc 1, shorter dl) AND
    # rank-2 semantically -> fusion puts the both-signals doc first;
    # doc 3 (lexically absent, semantic rank-1) still surfaces
    assert ids[0] == 2 and set(ids) == {1, 2, 3}
    got_scores = {r["doc_id"]: r["rrf_score"] for r in got}
    assert got_scores[2] == round(1 / 61 + 1 / 62, 6)
    assert got_scores[3] == round(1 / 61, 6)
    assert got_scores[1] == round(1 / 62 + 1 / 63, 6)
