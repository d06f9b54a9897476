"""More-like-this (query/mlt.py)."""

import math

import pytest

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex
from caterpillar_spark.query.mlt import mlt_seed_terms, more_like_this


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "rare gem rare gem common common"),
            (2, "rare gem common stuff"),
            (3, "common stuff only here"),
            (4, "totally unrelated words everywhere"),
        ],
        "doc_id long, text string",
    )
    return MemoryIndex(build_frames(docs, text_cols=["text"], frame_size=0))


def test_seed_terms_rank_by_tfidf(index):
    # doc 1: rare/gem tf=2 df=2; common tf=2 df=3 -> rare,gem outrank common
    terms = mlt_seed_terms(index, 1, max_terms=2)
    assert terms == ["gem", "rare"]  # equal contrib -> term asc tie-break
    n, df_rare, df_common = 4, 2, 3
    c_rare = 2 * (1 + math.log(n / (df_rare + 1)))
    c_common = 2 * (1 + math.log(n / (df_common + 1)))
    assert c_rare > c_common


def test_more_like_this_excludes_seed_and_ranks(index):
    got = [(r["doc_id"], r["score"]) for r in more_like_this(index, 1, max_terms=3, k=5).collect()]
    ids = [d for d, _ in got]
    assert 1 not in ids
    # doc 2 shares rare+gem+common; doc 3 only common; doc 4 nothing
    assert ids[:2] == [2, 3] and 4 not in ids
    assert got[0][1] > got[1][1]


def test_seed_terms_unique_on_multifield_index(spark):
    """term_stats has one row per (term, field): seed extraction must
    merge them — no duplicate seed terms, df summed across fields."""
    docs = spark.createDataFrame(
        [
            (1, "rare gem", "rare title"),
            (2, "rare common", "other words"),
            (3, "common things", "more words"),
        ],
        "doc_id long, title string, body string",
    )
    idx = MemoryIndex(
        build_frames(docs, text_cols=["title", "body"], frame_size=0)
    )
    terms = mlt_seed_terms(idx, 1, max_terms=10)
    assert len(terms) == len(set(terms))
    assert set(terms) == {"rare", "gem", "title"}


def test_mlt_unknown_doc_raises(index):
    with pytest.raises(ValueError, match="no indexed terms"):
        more_like_this(index, 999)
