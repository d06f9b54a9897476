"""Per-field score boosts (engine.filter_frames field_boosts)."""

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex, filter_frames, search


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "gem stone", "plain words here"),
            (2, "other title", "gem gem in the body"),
            (3, "nothing", "relevant nowhere"),
        ],
        "doc_id long, title string, body string",
    )
    return MemoryIndex(
        build_frames(docs, text_cols=["title", "body"], frame_size=0)
    )


def _scores(index, **kw):
    return {
        r["doc_id"]: r["score"]
        for r in filter_frames(index, unit="document", **kw).collect()
    }


def test_boost_multiplies_per_field_contribution(index):
    import math

    # 6 frames total; 'gem' occurs in doc1.title (tf 1) and doc2.body
    # (tf 2) -> ff=2, tfidf weight w = 1 + ln(6/(2+1))
    w = 1.0 + math.log(6 / 3)
    boosted = _scores(index, should=["gem"], field_boosts={"title": 3.0})
    assert boosted[1] == pytest.approx(3.0 * 1 * w, rel=1e-12)
    assert boosted[2] == pytest.approx(1.0 * 2 * w, rel=1e-12)
    # unboosted sanity: no field_boosts == boosts of 1.0
    plain = _scores(index, should=["gem"])
    ones = _scores(index, should=["gem"], field_boosts={"title": 1.0})
    assert plain == ones
    assert plain[1] == pytest.approx(1 * w, rel=1e-12)


def test_zero_boost_silences_but_keeps_match(index):
    got = _scores(index, must=["gem"], field_boosts={"title": 0.0, "body": 0.0})
    assert set(got) == {1, 2}  # still matched
    assert all(v == 0.0 for v in got.values())


def test_boost_changes_ranking(index):
    # doc 2 has tf=2 in body; doc 1 tf=1 in title — title boost flips it
    plain = [r["doc_id"] for r in search(index, should=["gem"], k=2, unit="document").collect()]
    assert plain[0] == 2
    boosted = [
        r["doc_id"]
        for r in search(
            index, should=["gem"], k=2, unit="document",
            field_boosts={"title": 5.0},
        ).collect()
    ]
    assert boosted[0] == 1


def test_bm25f_weights_tf_inside_saturation(index):
    """bm25_doc + field_boosts = BM25F proper: tf_doc = sum_f w_f*tf_f
    BEFORE saturation.  Hand-computed on the fixture corpus:
    N=3 docs, df(gem)=2, dl = (5, 7, 3), avgdl = 5."""
    import math

    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def bm25(tf_w, dl):
        return idf * tf_w * (k1 + 1) / (tf_w + k1 * (1 - b + b * dl / 5.0))

    got = _scores(
        index, should=["gem"], scorer="bm25_doc", field_boosts={"title": 3.0}
    )
    # doc1: gem tf 1 in title -> tf_w = 3; doc2: tf 2 in body -> tf_w = 2
    assert got[1] == pytest.approx(bm25(3.0, 5), rel=1e-12)
    assert got[2] == pytest.approx(bm25(2.0, 7), rel=1e-12)
    # boosts of 1.0 == plain bm25_doc
    plain = _scores(index, should=["gem"], scorer="bm25_doc")
    ones = _scores(
        index, should=["gem"], scorer="bm25_doc", field_boosts={"title": 1.0}
    )
    assert plain == ones
    # saturation: tripling the field weight must NOT triple the score
    assert got[1] < 3 * plain[1]
