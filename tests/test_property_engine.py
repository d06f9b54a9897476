"""Property-based retrieval semantics: on random corpora and random
boolean queries, the engine must agree exactly with a direct Python
oracle implementing the reference formulas (sqlite.py:1321-1348,
1430-1441)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex, filter_frames

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]

corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=20),
    min_size=2,
    max_size=10,
)
terms_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True)


def _oracle(docs, must=(), should=(), must_not=(), at_least_n=None):
    """Reference TF-IDF boolean retrieval on word-list docs
    (frame_size=0: one frame per doc)."""
    n_frames = len(docs)
    tf = [
        {t: doc.count(t) for t in set(doc)}
        for doc in docs
    ]
    ff = {}
    for vec in tf:
        for t in vec:
            ff[t] = ff.get(t, 0) + 1
    positive = list(must) + list(should) + (list(at_least_n[1]) if at_least_n else [])
    weights = {
        t: (1.0 + math.log(n_frames / (ff[t] + 1.0))) if t in ff else 0.0
        for t in set(positive)
    }
    out = {}
    for i, vec in enumerate(tf):
        if any(t in vec for t in must_not):
            continue
        if must and not all(t in vec for t in must):
            continue
        if at_least_n and sum(t in vec for t in at_least_n[1]) < at_least_n[0]:
            continue
        if not any(t in vec for t in positive):
            continue
        score = sum(vec[t] * weights[t] for t in set(positive) if t in vec)
        out[i + 1] = score
    return out


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(docs=corpus_st, should=terms_st, must_not=terms_st)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_should_must_not_matches_oracle(sess, docs, should, must_not):
    must_not = [t for t in must_not if t not in should]
    rows = [Row(doc_id=i + 1, text=" ".join(d)) for i, d in enumerate(docs)]
    idx = MemoryIndex(build_frames(sess.createDataFrame(rows), frame_size=0))
    got = {
        r["doc_id"]: r["score"]
        for r in filter_frames(
            idx, should=should, must_not=must_not, unit="document"
        ).collect()
    }
    want = _oracle(docs, should=should, must_not=must_not)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


@given(docs=corpus_st, must=terms_st)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_must_and_at_least_n_match_oracle(sess, docs, must):
    rows = [Row(doc_id=i + 1, text=" ".join(d)) for i, d in enumerate(docs)]
    idx = MemoryIndex(build_frames(sess.createDataFrame(rows), frame_size=0))

    got = {
        r["doc_id"]: r["score"]
        for r in filter_frames(idx, must=must, unit="document").collect()
    }
    want = _oracle(docs, must=must)
    assert set(got) == set(want)

    n = max(1, len(must) - 1)
    got2 = {
        r["doc_id"]
        for r in filter_frames(
            idx, at_least_n=(n, list(must)), unit="document"
        ).collect()
    }
    want2 = set(_oracle(docs, at_least_n=(n, list(must))))
    assert got2 == want2
