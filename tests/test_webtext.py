"""Webtext source: input_hint shape, determinism, byte-identical
extraction, end-to-end ingest -> index -> query."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from caterpillar_spark.sources import (
    WEBTEXT_SCHEMA,
    extract_text,
    ingest_webtext,
    synthetic_webtext,
)


def test_schema_matches_input_hint(spark):
    df = synthetic_webtext(spark, 5)
    expected = [
        ("url", T.StringType()),
        ("warc_ts", T.TimestampType()),
        ("html", T.BinaryType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
    ]
    assert [(f.name, f.dataType) for f in df.schema.fields] == expected
    assert WEBTEXT_SCHEMA.fieldNames() == [n for n, _ in expected]


def test_deterministic_across_partitionings(spark):
    a = synthetic_webtext(spark, 64, seed=7, partitions=2)
    b = synthetic_webtext(spark, 64, seed=7, partitions=16)
    ha = a.select(F.md5(F.concat_ws("|", "url", "text", "lang")).alias("h"))
    hb = b.select(F.md5(F.concat_ws("|", "url", "text", "lang")).alias("h"))
    assert sorted(r["h"] for r in ha.collect()) == sorted(
        r["h"] for r in hb.collect()
    )
    # different seed -> different corpus
    c = synthetic_webtext(spark, 64, seed=8, partitions=2)
    assert sorted(r["h"] for r in ha.collect()) != sorted(
        r["h"]
        for r in c.select(
            F.md5(F.concat_ws("|", "url", "text", "lang")).alias("h")
        ).collect()
    )


def test_extract_text_byte_identical(spark):
    """input_hint per-row invariant: extracted text == text, per url."""
    df = extract_text(synthetic_webtext(spark, 40, seed=3))
    bad = df.where(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0


def test_extract_text_handles_noise(spark):
    raw = (
        b"<html><head><style>p{}</style></head><body>"
        b"<script>alert(1)</script><p>Hello &amp; <b>world</b>.</p>"
        b"<div>Second block</div></body></html>"
    )
    df = spark.createDataFrame([(raw,)], "html binary")
    out = extract_text(df).collect()[0]["extracted_text"]
    assert out == "Hello & world.\n\nSecond block"


def test_ingest_to_query_end_to_end(spark):
    from caterpillar_spark.framing import build_frames
    from caterpillar_spark.query import MemoryIndex, search

    docs = ingest_webtext(synthetic_webtext(spark, 120, seed=5))
    assert docs.columns == ["doc_id", "url", "text", "lang", "warc_ts"]
    assert docs.select("doc_id").distinct().count() == 120

    idx = MemoryIndex(build_frames(docs, metadata_cols=["lang"]))
    hits = search(idx, k=10, unit="document", should=["the"], scorer="bm25")
    rows = hits.collect()
    assert 0 < len(rows) <= 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    # metadata predicate over the ingested lang column
    en_only = search(
        idx, k=10, unit="document", should=["the"],
        metadata={"lang": {"=": "en"}},
    )
    assert en_only.count() > 0


def test_ingest_webtext_with_anchors(spark):
    """with_anchors=True attaches each page's incoming anchor text as
    a second TEXT field; a BM25F search over (text, anchor) retrieves
    through it end-to-end."""
    from pyspark.sql import functions as F

    from caterpillar_spark.framing import build_frames
    from caterpillar_spark.query import MemoryIndex, search
    from caterpillar_spark.sources import ingest_webtext, synthetic_webtext

    web = synthetic_webtext(spark, n_docs=200, seed=13).cache()
    docs = ingest_webtext(web, with_anchors=True).cache()
    assert {"anchor", "n_anchors"} <= set(docs.columns)
    linked = docs.where(F.col("n_anchors") > 0)
    n_linked = linked.count()
    assert n_linked > 0
    # anchors wrap corpus words, so every non-empty anchor field is
    # whitespace-joined words
    assert linked.where(F.col("anchor") == "").count() == 0
    # end-to-end: pick a word from some page's anchor field and search
    # the anchor field with a boost; that page must be retrieved
    row = linked.select("doc_id", "anchor").first()
    term = row.anchor.split(" ")[0].lower().strip(".")
    idx = MemoryIndex(build_frames(
        docs.select("doc_id", "text", "anchor"),
        text_cols=["text", "anchor"], frame_size=0,
    ))
    hits = search(idx, k=1000, unit="document", should=[term],
                  scorer="bm25_doc", field_boosts={"anchor": 2.0})
    assert row.doc_id in {r.doc_id for r in hits.collect()}
    web.unpersist()
    docs.unpersist()
