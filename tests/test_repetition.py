"""repetition_stats (ops/textstats.py): Gopher-style repetition signals."""

import pytest

from caterpillar_spark.ops.textstats import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a"),  # heavy repetition
            (2, "x y z w"),    # all distinct
            (3, "q"),          # single token: no bigrams/trigrams
            (4, ""),           # empty doc
        ],
        "doc_id long, text string",
    )


def test_defaults_hand_computed(docs):
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}

    r = rows[1]
    assert r["n_tokens"] == 5
    assert r["top_1gram_frac"] == round(3 / 5, 6)
    assert r["top_2gram_frac"] == round(2 / 4, 6)
    assert r["dup_3gram_frac"] == round(2 / 3, 6)  # "a b a" twice of 3

    r = rows[2]
    assert r["n_tokens"] == 4
    assert r["top_1gram_frac"] == round(1 / 4, 6)
    assert r["top_2gram_frac"] == round(1 / 3, 6)
    assert r["dup_3gram_frac"] == 0.0

    r = rows[3]
    assert (r["n_tokens"], r["top_1gram_frac"]) == (1, 1.0)
    assert r["top_2gram_frac"] == 0.0 and r["dup_3gram_frac"] == 0.0

    r = rows[4]
    assert r["n_tokens"] == 0
    assert r["top_1gram_frac"] == 0.0
    assert r["top_2gram_frac"] == 0.0 and r["dup_3gram_frac"] == 0.0


def test_custom_sizes(docs):
    out = repetition_stats(docs, top_ngrams=(2,), dup_ngrams=(2,))
    assert out.columns == ["doc_id", "n_tokens", "top_2gram_frac", "dup_2gram_frac"]
    r = {x["doc_id"]: x for x in out.collect()}[1]
    assert r["n_tokens"] == 5  # unigram totals kept even when not requested
    assert r["top_2gram_frac"] == 0.5
    assert r["dup_2gram_frac"] == 1.0  # every bigram instance duplicated


def test_rejects_bad_sizes(docs):
    with pytest.raises(ValueError):
        repetition_stats(docs, top_ngrams=(0,))


def test_source_stats(spark):
    from caterpillar_spark.ops.textstats import source_stats

    docs = spark.createDataFrame(
        [
            (1, "dup text", "en", "a"),
            (2, "dup text", "de", "a"),   # exact dup of 1 (diff lang)
            (3, "unique here", "en", "a"),
            (4, "other site", "en", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in source_stats(docs).collect()}
    a = got["a"]
    assert a["n_docs"] == 3 and a["n_langs"] == 2
    assert a["dup_frac"] == round(1 - 2 / 3, 6)
    assert a["mean_chars"] == round((8 + 8 + 11) / 3, 6)
    b = got["b"]
    assert (b["n_docs"], b["n_langs"], b["dup_frac"]) == (1, 1, 0.0)


def test_plan_is_jvm_only(docs):
    plan = (
        repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # both aggregations partial-aggregate (map-side combine present)
    assert plan.count("HashAggregate") >= 4
