"""Minimal-window proximity search (query/analytics.py
proximity_search): hand-computed spans, the ordered/window=n-1 ≡
exact-adjacency invariant vs search_ngram, and argument guards.
The driver oracle (DuckDB 3-way positional join) covers the
parquet-scale equivalence."""
import pytest

from caterpillar_spark.query.analytics import proximity_search, search_ngram


def _postings(spark, docs):
    """docs: {doc_id: 'space separated tokens'} → postings relation
    (term, doc_id, frame_seq=0, positions) — one whole-doc frame."""
    rows = []
    for doc_id, text in docs.items():
        pos = {}
        for i, t in enumerate(text.split()):
            pos.setdefault(t, []).append(i)
        rows += [(t, doc_id, 0, p) for t, p in pos.items()]
    return spark.createDataFrame(
        rows, "term string, doc_id long, frame_seq int, positions array<int>"
    )


@pytest.fixture(scope="module")
def posts(spark):
    return _postings(
        spark,
        {
            1: "a b c d e f g",
            2: "x a x x d a",
            3: "a q q q q d",
            4: "b c b",
        },
    )


def test_unordered_spans(spark, posts):
    out = {
        r["doc_id"]: (r["min_span"], r["n_windows"])
        for r in proximity_search(posts, ["a", "d"], window=3).collect()
    }
    # doc 1: a@0 d@3 → span 3; doc 2: a@[1,5] d@4 → spans {3,1};
    # doc 3: span 5 > 3 → excluded
    assert out == {1: (3, 1), 2: (1, 2)}
    wide = {
        r["doc_id"]: r["min_span"]
        for r in proximity_search(posts, ["a", "d"], window=5).collect()
    }
    assert wide == {1: 3, 2: 1, 3: 5}


def test_ordered_direction(spark, posts):
    # ordered a-before-d: doc 2 keeps only (a@1, d@4); the tighter
    # (d@4, a@5) pair is wrong-order
    out = {
        r["doc_id"]: (r["min_span"], r["n_windows"])
        for r in proximity_search(
            posts, ["a", "d"], window=3, ordered=True
        ).collect()
    }
    assert out == {1: (3, 1), 2: (3, 1)}
    # reversed term order flips which doc-2 pair qualifies
    rev = {
        r["doc_id"]: r["min_span"]
        for r in proximity_search(
            posts, ["d", "a"], window=3, ordered=True
        ).collect()
    }
    assert rev == {2: 1}


def test_three_terms(spark, posts):
    out = {
        r["doc_id"]: (r["min_span"], r["n_windows"])
        for r in proximity_search(posts, ["b", "c", "d"], window=2).collect()
    }
    # doc 1: b@1 c@2 d@3 → span 2; doc 4 has no d
    assert out == {1: (2, 1)}


def test_ordered_window_n_minus_1_is_adjacency(spark):
    docs = {
        i: " ".join(
            ["u", "v", "w"][(i * 7 + j) % 3] for j in range(12)
        )
        for i in range(40)
    }
    posts = _postings(spark, docs)
    adj = {
        (r["doc_id"], r["frame_seq"]): r["matches"]
        for r in search_ngram(posts, ["u", "v"]).collect()
    }
    prox = {
        (r["doc_id"], 0): r["n_windows"]
        for r in proximity_search(
            posts, ["u", "v"], window=1, ordered=True
        ).collect()
    }
    assert adj == prox


def test_guards(spark, posts):
    with pytest.raises(ValueError):
        proximity_search(posts, ["a"], window=3)
    with pytest.raises(ValueError):
        proximity_search(posts, ["a", "a"], window=3)
    with pytest.raises(ValueError):
        proximity_search(posts, ["a", "b", "c"], window=1)
