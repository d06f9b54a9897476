"""significant_terms (query/analytics.py): match-set vs corpus lift."""

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex
from caterpillar_spark.query.analytics import significant_terms


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "query shared alpha"),
            (2, "query shared beta"),
            (3, "common noise alpha"),
            (4, "common noise beta"),
        ],
        "doc_id long, text string",
    )
    return MemoryIndex(build_frames(docs, text_cols=["text"], frame_size=0))


def test_lift_hand_computed(index):
    got = [
        (r["term"], r["fg_docs"], r["bg_docs"], r["lift"])
        for r in significant_terms(index, k=10, should=["query"]).collect()
    ]
    # matches = {1,2} (n_fg=2, n_bg=4): query/shared are in 2/2 matched
    # vs 2/4 corpus -> lift 2.0; alpha/beta fall under min_fg_docs=2
    assert got == [("query", 2, 2, 2.0), ("shared", 2, 2, 2.0)]


def test_min_fg_and_k(index):
    got = {
        r["term"]: r["lift"]
        for r in significant_terms(
            index, k=10, min_fg_docs=1, should=["query"]
        ).collect()
    }
    assert got["alpha"] == got["beta"] == 1.0  # 1/2 vs 2/4: no lift
    assert got["query"] == 2.0
    assert "common" not in got and "noise" not in got  # fg_docs = 0
    top1 = significant_terms(index, k=1, should=["query"]).collect()
    assert [r["term"] for r in top1] == ["query"]  # lift tie -> term asc
