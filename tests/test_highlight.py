"""Highlight offsets (query/highlight.py): exactness against the stored text."""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex, search
from caterpillar_spark.query.highlight import highlight_search, term_occurrences


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark joins a table to a table"),
            (2, "the table of Spark data"),  # case-insensitive match
            (3, "no matches here at all"),
        ],
        "doc_id long, text string",
    )
    frames = build_frames(docs, text_cols=["text"], frame_size=0)
    return docs, MemoryIndex(frames)


def test_occurrences_positions_and_offsets_exact(corpus):
    docs, _ = corpus
    got = {
        (r["doc_id"], r["term"], r["pos"], r["char_offset"])
        for r in term_occurrences(docs, ["spark", "table"]).collect()
    }
    text1 = "spark joins a table to a table"
    text2 = "the table of Spark data"
    want = {
        (1, "spark", 0, 0),
        (1, "table", 3, text1.index("table")),
        (1, "table", 6, text1.rindex("table")),
        (2, "table", 1, text2.index("table")),
        (2, "spark", 3, text2.index("Spark")),
    }
    assert got == want
    # offsets slice back to the token itself
    for doc, term, _pos, off in got:
        src = {1: text1, 2: text2}[doc]
        assert src[off : off + len(term)].lower() == term


def test_highlight_search_joins_topk_only(corpus):
    docs, idx = corpus
    out = highlight_search(
        idx, docs, k=1, unit="document", should=["table"], scorer="tfidf"
    ).collect()
    # k=1: only the best doc (doc 1, two 'table' hits) is highlighted
    assert {r["doc_id"] for r in out} == {1}
    assert sorted(r["pos"] for r in out) == [3, 6]
    top = search(idx, k=1, unit="document", should=["table"]).collect()[0]
    assert all(abs(r["score"] - top["score"]) < 1e-12 for r in out)


def test_highlight_variant_groups_and_no_positive_terms(corpus):
    docs, idx = corpus
    out = highlight_search(
        idx, docs, k=3, unit="document", must=[("spark", "data")]
    )
    assert {r["term"] for r in out.collect()} <= {"spark", "data"}
    with pytest.raises(ValueError, match="no positive terms"):
        highlight_search(idx, docs, k=3, unit="document")


def test_frame_unit_highlight(corpus):
    docs, idx = corpus
    out = highlight_search(
        idx,
        idx.frames,
        k=2,
        unit="frame",
        text_col="frame_text",
        should=["table"],
    )
    cols = out.columns
    assert cols[:3] == ["doc_id", "field", "frame_seq"]
    assert {r["term"] for r in out.collect()} == {"table"}


def test_snippet_window(corpus):
    docs, idx = corpus
    out = highlight_search(
        idx, docs, k=1, unit="document", should=["table"], snippet_window=2
    ).collect()
    # doc 1: "spark joins a table to a table"
    by_pos = {r["pos"]: r["snippet"] for r in out}
    assert by_pos == {
        3: "joins a table to a",
        6: "to a table",  # window clipped at the document end
    }
    wide = term_occurrences(
        docs, ["spark"], snippet_window=100
    ).collect()
    # window wider than the doc = the whole text
    assert all(
        r["snippet"].lower().count(r["term"]) >= 1 and " " in r["snippet"]
        for r in wide
    )
    with pytest.raises(ValueError, match="snippet_window"):
        term_occurrences(docs, ["spark"], snippet_window=-1)


def test_plan_jvm_only_and_broadcast(corpus):
    docs, idx = corpus
    plan = (
        highlight_search(idx, docs, k=2, unit="document", should=["table"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
