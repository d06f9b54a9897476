"""Query-string parser (query/parser.py): parse goldens + execution parity."""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.query import MemoryIndex, search
from caterpillar_spark.query.parser import (
    Fuzzy,
    Prefix,
    execute_query,
    parse_query,
)


# ---------------------------------------------------------------- parsing

def test_parse_modifiers_and_expansions():
    s = parse_query('+spark -join tabl~1 str* plain other~')
    assert s.must == ["spark"]
    assert s.must_not == ["join"]
    assert s.should == [Fuzzy("tabl", 1), Prefix("str"), "plain", Fuzzy("other", 2)]
    assert s.phrases == [] and s.metadata == {}


def test_parse_phrases_and_metadata():
    s = parse_query('"hash join" -"slow scan" lang:en n_chars:>=100 n_chars:<300 "solo"')
    assert s.phrases == [["hash", "join"]]
    assert s.not_phrases == [["slow", "scan"]]
    assert s.metadata == {"lang": {"=": "en"}, "n_chars": {">=": 100, "<": 300}}
    assert s.should == ["solo"]  # quoted single word = plain term


def test_parse_rejections():
    with pytest.raises(ValueError, match="no positive clause"):
        parse_query("-only -negative")
    with pytest.raises(ValueError, match="negated metadata"):
        parse_query("spark -lang:en")
    with pytest.raises(ValueError, match="fuzzy distance"):
        parse_query("term~3")


def test_parse_case_folding():
    s = parse_query("+SPARK Tabl~1 LANG:EN")
    assert s.must == ["spark"]
    assert s.should == [Fuzzy("tabl", 1)]
    assert s.metadata == {"LANG": {"=": "en"}}


def test_parse_query_total_on_printable_garbage():
    """parse_query is total over printable ASCII: it either returns a
    QuerySpec or raises ValueError — never an unexpected exception
    (regex edge cases: bare '~', '*', ':', unbalanced quotes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        )
    )
    def run(q):
        try:
            spec = parse_query(q)
        except ValueError:
            return
        assert spec.must or spec.should or spec.phrases or spec.metadata

    run()


# ---------------------------------------------------------------- execution

@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark table join fast hash join", "en", 100),
            (2, "spark stream window table",        "en", 250),
            (3, "table scan slow join",             "de", 100),
            (4, "spark spark table",                "en", 400),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    frames = build_frames(
        docs, text_cols=["text"], metadata_cols=["lang", "n_chars"], frame_size=0
    )
    return MemoryIndex(frames)


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_execute_matches_handbuilt_spec(index):
    got = execute_query(index, "+spark table -slow", k=10)
    want = search(
        index, k=10, unit="document",
        must=[("spark",)], should=[("table",)], must_not=["slow"],
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    assert _ids(got)  # non-vacuous


def test_execute_fuzzy_and_prefix_expansion(index):
    got = execute_query(index, "+tabl~1 str*", k=10)
    # tabl~1 -> {table}; str* -> {stream}
    want = search(
        index, k=10, unit="document", must=[("table",)], should=[("stream",)]
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_execute_metadata_conjunction(index):
    got = execute_query(index, "spark lang:en n_chars:>=200", k=10)
    assert sorted(_ids(got)) == [2, 4]


def test_execute_phrase_constraint(index):
    # 'fast hash' appears only in doc 1
    got = execute_query(index, 'spark "fast hash"', k=10)
    assert _ids(got) == [1]
    anti = execute_query(index, 'spark -"fast hash"', k=10)
    assert 1 not in _ids(anti) and set(_ids(anti)) == {2, 4}


def test_execute_phrase_only_scores_by_matches(index):
    got = execute_query(index, '"spark table"', k=10).collect()
    # docs 1 and 4 contain the bigram once each
    assert {(r["doc_id"], r["score"]) for r in got} == {(1, 1.0), (4, 1.0)}


def test_execute_metadata_only(index):
    got = execute_query(index, "lang:de", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [(3, 0.0)]


def test_phrase_routes_to_compressed_positions(spark, index, tmp_path):
    """Over a persisted with_positions index the parser's phrase
    clauses run on the varint positions layout; results must equal the
    in-memory raw-postings path exactly."""
    from caterpillar_spark.indexing.build import build_index

    pidx = build_index(
        index.frames, str(tmp_path / "idx"), num_buckets=4,
        block_bits=2, with_positions=True,
    )
    assert pidx.manifest.get("with_positions")
    for q in ('spark "fast hash"', '"spark table"', 'table -"fast hash"'):
        a = sorted(tuple(r) for r in execute_query(index, q, k=10).collect())
        for engine in ("auto", "postings", "compressed"):
            b = sorted(
                tuple(r)
                for r in execute_query(
                    pidx, q, k=10, phrase_engine=engine
                ).collect()
            )
            assert a == b and a, (q, engine)
    with pytest.raises(ValueError, match="with_positions"):
        execute_query(index, '"spark table"', phrase_engine="compressed")


def test_execute_many_parity_with_single(index):
    from caterpillar_spark.query.parser import execute_many

    qs = {
        "qa": "+spark table -slow",
        "qb": "+tabl~1 str*",
        "qc": "scan",
        "qd": "+zzzz~1",  # unsatisfiable required expansion
    }
    batch = execute_many(index, qs, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid in ("qa", "qb", "qc"):
        single = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_query(index, qs[qid], k=5).collect()
        ]
        assert got.get(qid, []) == single, qid
    assert "qd" not in got  # contributed no rows


def test_execute_many_rejections(index):
    from caterpillar_spark.query.parser import execute_many

    with pytest.raises(ValueError, match="phrase clauses"):
        execute_many(index, {"q": 'spark "fast hash"'})
    with pytest.raises(ValueError, match="metadata clauses"):
        execute_many(index, {"q": "spark lang:en"})
    with pytest.raises(ValueError, match="no term clause"):
        execute_many(index, {"q": "-spark lang:en"})


def test_execute_query_wand_parity(index):
    from caterpillar_spark.query.expand import fuzzy_terms, prefix_terms
    from caterpillar_spark.query.parser import execute_query_wand
    from caterpillar_spark.query.wand import CompressedIndex, wand_topk

    cidx = CompressedIndex.build(index.postings(), num_buckets=4, block_bits=2)

    # pure-OR with fuzzy+prefix expansion == wand_topk on the flat set
    expanded = sorted(
        {r["term"] for r in fuzzy_terms(index, "tabl", 1).collect()}
        | {r["term"] for r in prefix_terms(index, "str").collect()}
    )
    want = [tuple(r) for r in wand_topk(cidx, expanded, k=5).collect()]
    got = [
        tuple(r)
        for r in execute_query_wand(index, cidx, "tabl~1 str*", k=5).collect()
    ]
    assert got == want and got

    # pure-AND single terms + exclusion
    want = [
        tuple(r)
        for r in wand_topk(
            cidx, ["spark", "table"], k=5, mode="and", must_not=["slow"]
        ).collect()
    ]
    got = [
        tuple(r)
        for r in execute_query_wand(
            index, cidx, "+spark +table -slow", k=5
        ).collect()
    ]
    assert got == want and got


def test_execute_query_wand_rejections(index):
    from caterpillar_spark.query.parser import execute_query_wand
    from caterpillar_spark.query.wand import CompressedIndex

    cidx = CompressedIndex.build(index.postings(), num_buckets=4, block_bits=2)
    with pytest.raises(ValueError, match="mixed must\\+should"):
        execute_query_wand(index, cidx, "+spark table")
    with pytest.raises(ValueError, match="metadata"):
        execute_query_wand(index, cidx, "spark lang:en")
    with pytest.raises(ValueError, match="approximate"):
        execute_query_wand(index, cidx, 'spark "fast hash"')
    with pytest.raises(ValueError, match="any-of"):
        execute_query_wand(index, cidx, "+hast~1")  # ball = {fast, hash}
    # unsatisfiable required expansion -> empty, not an error
    assert execute_query_wand(index, cidx, "+zzzz~1 +spark").collect() == []


def test_execute_many_wand_parity(index):
    from caterpillar_spark.query.parser import (
        execute_many_wand,
        execute_query_wand,
    )
    from caterpillar_spark.query.wand import CompressedIndex

    cidx = CompressedIndex.build(index.postings(), num_buckets=4, block_bits=2)
    qs = {"qa": "tabl~1 str*", "qb": "spark hash", "qc": "zzzz~1"}
    batch = execute_many_wand(index, cidx, qs, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid in ("qa", "qb"):
        single = [
            (r["doc_id"], round(r["score"], 9))
            for r in execute_query_wand(index, cidx, qs[qid], k=5).collect()
        ]
        assert got.get(qid, []) == single, qid
    assert "qc" not in got  # unsatisfiable expansion contributes nothing
    with pytest.raises(ValueError, match="pure-OR"):
        execute_many_wand(index, cidx, {"q": "+spark table"})


def test_unsatisfiable_must_expansion_is_empty(index):
    out = execute_query(index, "+zzzzzz~1 spark", k=10)
    assert out.collect() == []
    # ...but an unsatisfiable OPTIONAL expansion is dropped
    out2 = execute_query(index, "zzzzzz~1 spark", k=10)
    assert set(_ids(out2)) == {1, 2, 4}


# ---------------------------------------------------------------- proximity

def test_parse_sloppy_phrases():
    s = parse_query('table "spark join"~3 -"slow join"~2')
    assert s.near == [(["spark", "join"], 3)]
    assert s.not_near == [(["slow", "join"], 2)]
    assert s.should == ["table"] and s.phrases == []


def test_parse_sloppy_phrase_rejections():
    with pytest.raises(ValueError, match="at least 2 words"):
        parse_query('"spark"~3')
    with pytest.raises(ValueError, match="cannot fit"):
        parse_query('"a b c"~1')
    with pytest.raises(ValueError, match="repeats a word"):
        parse_query('"the the"~2')


def test_execute_near_constraint(index):
    # spark..join within a 2-token span: only doc 1 (spark@0, join@2)
    got = execute_query(index, 'table "spark join"~2', k=10)
    assert _ids(got) == [1]
    # unordered: reversed words match the same doc
    rev = execute_query(index, 'table "join spark"~2', k=10)
    assert _ids(rev) == [1]
    anti = execute_query(index, 'table -"spark join"~2', k=10)
    assert set(_ids(anti)) == {2, 3, 4}


def test_execute_near_only_scores_by_windows(index):
    # doc 1: spark@0, join@{2,5} -> qualifying windows (0,2) and (0,5)
    got = execute_query(index, '"spark join"~5', k=10).collect()
    assert {(r["doc_id"], r["score"]) for r in got} == {(1, 2.0)}


def test_execute_query_wand_rejects_near(spark, index, tmp_path):
    from caterpillar_spark.query.parser import execute_query_wand

    with pytest.raises(ValueError, match="proximity"):
        execute_query_wand(index, None, 'spark "fast hash"~2')
