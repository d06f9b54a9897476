"""Fuzzy / prefix term expansion (query/expand.py).

The exactness contract: fuzzy_terms == brute-force Levenshtein ball
over the vocabulary, for vocabularies engineered to contain
deletion-neighborhood false positives ("ab"/"ba" share deletions at
distance 2-apart) and true positives of every edit kind
(substitution, insertion, deletion, identity).
"""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex, search
from caterpillar_spark.query.expand import (
    deletion_index,
    fuzzy_search,
    fuzzy_terms,
    prefix_search,
    prefix_terms,
)

VOCAB = [
    "table", "tables", "tble", "cable", "tab", "tale",   # 1-edit family
    "stable", "tibble",                                   # 2-edit family
    "ab", "ba", "spark", "spa", "span", "sort", "part",
]


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(VOCAB[i:] + VOCAB[:i])) for i in range(len(VOCAB))],
        "doc_id long, text string",
    )
    frames = build_frames(docs, text_cols=["text"], frame_size=0)
    return MemoryIndex(frames)


@pytest.mark.parametrize("query", ["table", "tble", "ab", "spark", "xyzzy"])
@pytest.mark.parametrize("max_edits", [1, 2])
def test_fuzzy_exact_vs_bruteforce(index, query, max_edits):
    got = {
        (r["term"], r["distance"])
        for r in fuzzy_terms(index, query, max_edits).collect()
    }
    want = {
        (t, _lev(t, query)) for t in VOCAB if _lev(t, query) <= max_edits
    }
    assert got == want


def test_fuzzy_via_precomputed_deletion_index(index):
    di = deletion_index(index, max_edits=1)
    direct = {
        (r["term"], r["distance"])
        for r in fuzzy_terms(index, "table", 1).collect()
    }
    probed = {
        (r["term"], r["distance"])
        for r in fuzzy_terms(index, "table", 1, deletion_df=di).collect()
    }
    assert probed == direct and direct  # non-vacuous


def test_fuzzy_max_expansions_deterministic(index):
    rows = fuzzy_terms(index, "table", 2, max_expansions=3).collect()
    got = [(r["term"], r["distance"]) for r in rows]
    # distance asc, term asc: the distance-0 match first, then the
    # lexicographically-first distance-1 matches
    assert got == [("table", 0), ("cable", 1), ("stable", 1)]


def test_prefix_terms(index):
    got = sorted(r["term"] for r in prefix_terms(index, "ta").collect())
    assert got == ["tab", "table", "tables", "tale"]
    capped = [r["term"] for r in prefix_terms(index, "ta", max_expansions=2).collect()]
    assert capped == ["tab", "table"]
    with pytest.raises(ValueError):
        prefix_terms(index, "")


def test_fuzzy_search_equals_explicit_variant_group(index):
    expanded = sorted(
        r["term"] for r in fuzzy_terms(index, "table", 1).collect()
    )
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(index, must=[tuple(expanded)], k=5, unit="document").collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in fuzzy_search(index, "table", 1, k=5, unit="document").collect()
    ]
    assert got == want and got


def test_prefix_search_equals_explicit_variant_group(index):
    expanded = sorted(r["term"] for r in prefix_terms(index, "sp").collect())
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(index, must=[tuple(expanded)], k=5, unit="document").collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in prefix_search(index, "sp", k=5, unit="document").collect()
    ]
    assert got == want and got


def test_suggest_ranked_by_distance_then_freq(index):
    from caterpillar_spark.query.expand import suggest

    got = [
        (r["term"], r["distance"], r["weight"])
        for r in suggest(index, "tble", max_edits=2, k=4).collect()
    ]
    # every VOCAB term appears once per doc -> all totals equal, so the
    # rank order is (distance asc, term asc); cross-check via brute force
    ball = sorted(
        ((_lev(t, "tble"), t) for t in VOCAB if _lev(t, "tble") <= 2)
    )[:4]
    assert got == [(t, d, len(VOCAB)) for (d, t) in ball]


def test_fuzzy_and_suggest_over_compressed_index(spark, index):
    from caterpillar_spark.query.expand import suggest
    from caterpillar_spark.query.wand import CompressedIndex

    cidx = CompressedIndex.build(index.postings(), num_buckets=4, block_bits=2)
    direct = {
        (r["term"], r["distance"])
        for r in fuzzy_terms(index, "table", 1).collect()
    }
    via_lists = {
        (r["term"], r["distance"])
        for r in fuzzy_terms(cidx, "table", 1).collect()
    }
    assert via_lists == direct and direct
    # raw-postings weight = total occurrences; compressed weight = df
    # (block n_docs metadata, decode-free). Every VOCAB term appears
    # exactly once per doc here, so the two ranks coincide numerically.
    a = suggest(index, "tble", 2, k=3).collect()
    b = suggest(cidx, "tble", 2, k=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_suggest_merges_appended_partial_stats(spark, tmp_path):
    """term_stats carries one row per (term, field[, batch]); suggest
    weights must SUM the partial rows — an appended index ranks by the
    combined corpus frequency."""
    from caterpillar_spark.query.expand import suggest, term_weights
    from caterpillar_spark.streaming.incremental import append_batch

    path = str(tmp_path / "idx")
    d1 = spark.createDataFrame(
        [(1, "table table fast"), (2, "hash table")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(3, "fast fast fast table")], "doc_id long, text string"
    )
    append_batch(build_frames(d1, text_cols=["text"], frame_size=0), path,
                 num_buckets=4, batch_id=0)
    idx = append_batch(build_frames(d2, text_cols=["text"], frame_size=0),
                       path, num_buckets=4, batch_id=1)
    w = {r["term"]: r["weight"] for r in term_weights(idx).collect()}
    assert w == {"table": 4, "fast": 4, "hash": 1}
    got = [tuple(r) for r in suggest(idx, "fash", 1, k=2).collect()]
    assert got == [("fast", 1, 4), ("hash", 1, 1)]  # weight desc


def test_no_match_raises(index):
    with pytest.raises(ValueError, match="matched no vocabulary terms"):
        fuzzy_search(index, "qqqqqqqq", 1, k=5)


def test_vocab_scan_stays_jvm(index):
    """The ad-hoc fuzzy scan must be pure JVM (no BatchEvalPython /
    mapInPandas in the plan) — higher-order functions + levenshtein."""
    plan = fuzzy_terms(index, "table", 1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
