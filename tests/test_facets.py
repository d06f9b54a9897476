"""facet_counts (query/facets.py)."""

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex
from caterpillar_spark.query.facets import facet_counts


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark table join", "en", 10),
            (2, "spark stream",      "en", 20),
            (3, "spark table",       "de", 10),
            (4, "window sort",       "de", 30),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    frames = build_frames(
        docs, text_cols=["text"], metadata_cols=["lang", "n_chars"], frame_size=0
    )
    return MemoryIndex(frames)


def test_facets_over_match_set(index):
    got = {
        (r["field"], r["value"]): r["n"]
        for r in facet_counts(index, ["lang"], should=["spark"]).collect()
    }
    # docs 1,2,3 match 'spark': en=2, de=1
    assert got == {("lang", "en"): 2, ("lang", "de"): 1}


def test_multi_field_one_pass(index):
    out = facet_counts(index, ["lang", "n_chars"], should=["table"])
    got = {(r["field"], r["value"]): r["n"] for r in out.collect()}
    # docs 1,3 match 'table'
    assert got == {
        ("lang", "en"): 1,
        ("lang", "de"): 1,
        ("n_chars", "10"): 2,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_must_not_and_boolean_semantics(index):
    got = {
        (r["field"], r["value"]): r["n"]
        for r in facet_counts(
            index, ["lang"], must=["spark"], must_not=["table"]
        ).collect()
    }
    assert got == {("lang", "en"): 1}  # only doc 2


def test_facet_ranges(index):
    from caterpillar_spark.query.facets import facet_ranges

    got = {
        (r["bucket_start"], r["bucket_end"]): r["n"]
        for r in facet_ranges(index, "n_chars", 15, should=["spark"]).collect()
    }
    # docs 1,2,3 match; n_chars 10,20,10 -> [0,15): 2, [15,30): 1
    assert got == {(0.0, 15.0): 2, (15.0, 30.0): 1}
    with pytest.raises(ValueError, match="width"):
        facet_ranges(index, "n_chars", 0, should=["spark"])


def test_errors(index):
    with pytest.raises(ValueError, match="facet field"):
        facet_counts(index, [], should=["spark"])
    with pytest.raises(ValueError, match="lacks columns"):
        facet_counts(index, ["nope"], should=["spark"])
