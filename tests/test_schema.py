"""Schema / FieldType layer: container semantics, per-type operator
support, metadata validation + value analysis, and schema-driven
framing (mirrors reference processing/test/test_schema.py plus the
_validate_analyse_metadata behavior of processing/index.py:1382-1428).
"""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.schema import (
    BOOLEAN,
    CATEGORICAL_TEXT,
    DATETIME,
    FieldConfigurationError,
    FieldType,
    ID,
    NUMERIC,
    NonIndexedFieldError,
    NonSearchableOperatorError,
    Schema,
    TEXT,
    UnknownFieldError,
    UnsupportedOperatorError,
    build_frames_for_schema,
    normalize_metadata_columns,
    validate_metadata,
)


def test_schema_container():
    s = Schema(test=TEXT, user=ID)
    assert len(s) == 2
    assert s.names() == ["test", "user"]
    assert len(s.items()) == 2
    assert isinstance(s["test"], TEXT)
    assert isinstance(s["user"], ID)
    with pytest.raises(KeyError):
        s["no_item"]
    for field in s:
        assert isinstance(field, FieldType)
    assert "test" in s and "text" not in s

    with pytest.raises(FieldConfigurationError):
        s.add("_test", TEXT)          # underscore names reserved
    with pytest.raises(FieldConfigurationError):
        s.add("test", TEXT)           # duplicate field
    with pytest.raises(FieldConfigurationError):
        s.add("text", object)         # not a FieldType class
    with pytest.raises(FieldConfigurationError):
        s.add("text", str)
    with pytest.raises(FieldConfigurationError):
        s.add("text", "TEXT")         # not a FieldType instance


def test_field_types():
    with pytest.raises(ValueError):
        NUMERIC(num_type=str)
    with pytest.raises(ValueError):
        NUMERIC().analyse_value("notanumber")
    assert NUMERIC().analyse_value("") is None          # default_value
    assert NUMERIC(default_value=7).analyse_value(None) == 7
    f = NUMERIC(num_type=float)
    assert f.analyse_value("1") == f.analyse_value("1.0") == 1.0

    assert BOOLEAN().analyse_value("1") is True
    assert BOOLEAN().analyse_value(0) is False

    c = CATEGORICAL_TEXT()
    assert c.analyse_value("  cat  ") == "cat"
    assert "*=" in c.ops and "=" in c.ops and "<" not in c.ops

    # DATETIME: custom strptime format, normalized ISO-8601 UTC,
    # lexicographically comparable (reference schema.py:204-233; the
    # reference prints 'z', we print '+00:00' — documented deviation).
    dt = DATETIME(datetime_formats=["%H:%M %d/%m/%Y"])
    v = dt.analyse_value("10:05 01/12/2016")
    assert v == "2016-12-01T10:05:00+00:00"
    assert dt.analyse_value("10:06 01/12/2016") > v
    assert dt.analyse_value("01:05 01/12/2016") < v
    assert dt.analyse_value("10:05 01/12/2015") < v

    # TEXT fields are not metadata-searchable at all
    assert TEXT().ops == frozenset()


def test_validate_metadata():
    sch = Schema(
        text=TEXT,
        lang=CATEGORICAL_TEXT(indexed=True),
        n_chars=NUMERIC(indexed=True),
        flagged=BOOLEAN(indexed=True),
        crawled=DATETIME(indexed=True),
        hidden=CATEGORICAL_TEXT(indexed=False),
    )

    with pytest.raises(UnknownFieldError):
        validate_metadata(sch, {"nope": {"=": "x"}})
    with pytest.raises(NonIndexedFieldError):
        validate_metadata(sch, {"text": {"=": "x"}})     # TEXT: terms, not metadata
    with pytest.raises(NonIndexedFieldError):
        validate_metadata(sch, {"hidden": {"=": "x"}})   # not indexed
    with pytest.raises(NonSearchableOperatorError):
        validate_metadata(sch, {"lang": {"!=": "en"}})
    with pytest.raises(UnsupportedOperatorError):
        validate_metadata(sch, {"n_chars": {"*=": "2.*"}})
    with pytest.raises(UnsupportedOperatorError):
        validate_metadata(sch, {"lang": {">=": "en"}})

    analysed = validate_metadata(
        sch,
        {
            "lang": {"=": " en ", "in": [" en", "de "]},
            "n_chars": {">=": "200"},
            "flagged": {"=": 1},
            "crawled": {"<": "2021-06-01T00:00:00"},
        },
    )
    assert analysed["lang"]["="] == "en"
    assert analysed["lang"]["in"] == ["en", "de"]
    assert analysed["n_chars"][">="] == 200
    assert analysed["flagged"]["="] is True
    assert analysed["crawled"]["<"] == "2021-06-01T00:00:00+00:00"

    # the wildcard regex passes through unanalysed
    assert validate_metadata(sch, {"lang": {"*=": "e."}})["lang"]["*="] == "e."


def test_schema_driven_framing_and_search(spark):
    """End-to-end: schema-declared analysis + validated metadata search,
    including a DATETIME range predicate on warc_ts and an anchored
    CATEGORICAL_TEXT wildcard."""
    from caterpillar_spark.query import MemoryIndex, filter_frames, filter_metadata
    from caterpillar_spark.sources import ingest_webtext, synthetic_webtext

    docs = ingest_webtext(synthetic_webtext(spark, 80, seed=5))
    sch = Schema(
        text=TEXT(),
        lang=CATEGORICAL_TEXT(indexed=True),
        warc_ts=DATETIME(indexed=True),
    )
    frames = build_frames_for_schema(docs, sch).cache()
    idx = MemoryIndex(frames)

    # the DATETIME column was normalized to ISO-8601 UTC text
    row = frames.select("warc_ts").first()
    assert isinstance(row["warc_ts"], str) and row["warc_ts"].endswith("+00:00")

    # range predicate on warc_ts == plain timestamp filter on the docs
    ts = sorted(r["warc_ts"] for r in docs.select("warc_ts").collect())
    cut = ts[len(ts) // 2]
    expect = docs.where(F.col("warc_ts") >= F.lit(cut)).count()
    got = (
        filter_metadata(frames, {"warc_ts": {">=": cut.isoformat()}}, schema=sch)
        .select("doc_id").distinct().count()
    )
    assert got == expect > 0

    # validated anchored wildcard: '^(?:e.)' matches 'en'/'es' only
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    match_langs = {l for l in langs if len(l) == 2 and l[0] == "e"}
    expect_wild = docs.where(F.col("lang").isin(list(match_langs))).count()
    got_wild = (
        filter_metadata(frames, {"lang": {"*=": "e."}}, schema=sch)
        .select("doc_id").distinct().count()
    )
    assert got_wild == expect_wild

    # full retrieval path accepts and validates the schema too
    res = filter_frames(
        idx, should=["the"], metadata={"lang": {"=": " en "}}, schema=sch
    )
    baseline = filter_frames(idx, should=["the"], metadata={"lang": {"=": "en"}})
    assert res.count() == baseline.count() > 0

    # invalid specs fail fast, before any Spark job
    with pytest.raises(UnknownFieldError):
        filter_frames(idx, should=["the"], metadata={"nope": {"=": 1}}, schema=sch)
    with pytest.raises(UnsupportedOperatorError):
        filter_frames(
            idx, should=["the"], metadata={"warc_ts": {"*=": "2021.*"}}, schema=sch
        )
    frames.unpersist()


def test_normalize_metadata_columns(spark):
    sch = Schema(
        lang=CATEGORICAL_TEXT(indexed=True),
        n=NUMERIC(indexed=True, num_type=float),
        ok=BOOLEAN(indexed=True),
    )
    df = spark.createDataFrame(
        [(" en ", "2", 1)], "lang string, n string, ok int"
    )
    out = normalize_metadata_columns(df, sch).first()
    assert out["lang"] == "en"
    assert out["n"] == 2.0
    assert out["ok"] is True
