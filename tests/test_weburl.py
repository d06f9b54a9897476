"""URL-level curation ops: canonicalization, snapshot dedup, host rollup.

Expected values are hand-computed; the cross-engine (DuckDB) check of
the same operators runs through the driver oracles in
``__spark_entry__.py`` (``url_snapshot_dedup`` / ``host_stats``).
"""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.ops import (
    canonical_url,
    host_filter,
    host_of,
    host_stats,
    host_suffixes,
    url_snapshot_dedup,
)

UTC = dt.timezone.utc

CANON_CASES = [
    # lowercases scheme+authority, preserves path case
    ("HTTPS://Site-1.Example.ORG/Page/9", "https://site-1.example.org/Page/9"),
    # fragment stripped
    ("https://a.org/p#section-2", "https://a.org/p"),
    # tracking params stripped, first-param repair restores '?'
    ("https://a.org/p?utm_source=feed&ref=2", "https://a.org/p?ref=2"),
    # tracking param in the middle
    ("https://a.org/p?ref=2&utm_medium=rss&x=1", "https://a.org/p?ref=2&x=1"),
    # all params tracking -> bare path
    ("https://a.org/p?utm_source=f&utm_medium=r", "https://a.org/p"),
    # default ports
    ("https://a.org:443/p", "https://a.org/p"),
    ("http://a.org:80", "http://a.org"),
    ("https://a.org:443", "https://a.org"),
    # non-default port kept
    ("https://a.org:8443/p", "https://a.org:8443/p"),
    # trailing slashes
    ("https://a.org/p/", "https://a.org/p"),
    ("https://a.org/", "https://a.org"),
    # everything at once
    (
        "HTTPS://A.ORG:443/Page/7/?utm_campaign=x#top",
        "https://a.org/Page/7",
    ),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(raw, want) for raw, want in CANON_CASES], ["raw", "want"]
    ).withColumn("got", canonical_url(F.col("raw")))
    bad = df.where(F.col("got") != F.col("want")).collect()
    assert not bad, [(r.raw, r.got, r.want) for r in bad]


def test_host_of(spark):
    cases = [
        ("https://User@Site.ORG:8443/p?q#f", "site.org"),
        ("http://a.b.c.example.com/", "a.b.c.example.com"),
    ]
    df = spark.createDataFrame(cases, ["raw", "want"]).withColumn(
        "got", host_of(F.col("raw"))
    )
    bad = df.where(F.col("got") != F.col("want")).collect()
    assert not bad, [(r.raw, r.got, r.want) for r in bad]


@pytest.fixture()
def crawl(spark):
    def ts(h):
        return dt.datetime(2024, 1, 1, h, tzinfo=UTC)

    rows = [
        # three captures of one page under equivalent URLs
        (1, "https://a.org/p", ts(1), "en"),
        (2, "https://a.org/p/", ts(3), "en"),
        (3, "HTTPS://A.ORG/p?utm_source=x", ts(2), "de"),
        # a second page on the same host
        (4, "https://a.org/q", ts(1), "en"),
        # another host, one capture
        (5, "http://b.org:80/r", ts(5), "fr"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url", "warc_ts", "lang"])


def test_url_snapshot_dedup_keeps_newest(crawl):
    out = url_snapshot_dedup(crawl).orderBy("canonical_url").collect()
    assert [(r.canonical_url, r.doc_id, r.n_snapshots) for r in out] == [
        ("http://b.org/r", 5, 1),
        ("https://a.org/p", 2, 3),  # ts(3) is newest of the three
        ("https://a.org/q", 4, 1),
    ]


def test_url_snapshot_dedup_tie_break(spark):
    t = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [(1, "https://a.org/p", t), (2, "https://a.org/p/", t)]
    df = spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
    (r,) = url_snapshot_dedup(df).collect()
    # equal timestamps -> smallest raw url wins (deterministic)
    assert r.doc_id == 1 and r.n_snapshots == 2


def test_url_snapshot_dedup_single_exchange(crawl):
    plan = url_snapshot_dedup(crawl)._jdf.queryExecution().executedPlan().toString()
    # row_number and the snapshot count share one hashpartitioning
    assert plan.count("Exchange hashpartitioning(canonical_url") == 1


def test_host_suffixes(spark):
    (r,) = (
        spark.createDataFrame([("a.b.example.org",)], ["h"])
        .select(host_suffixes(F.col("h")).alias("s"))
        .collect()
    )
    assert r.s == ["a.b.example.org", "b.example.org", "example.org", "org"]


@pytest.fixture()
def hosted(spark):
    rows = [
        (1, "https://news.bad.example/x"),   # subdomain of blocked domain
        (2, "https://bad.example/y"),        # exact blocked host
        (3, "https://notbad.example/z"),     # sibling: must NOT match
        (4, "https://ok.org/w"),
        (5, "https://Sub.OK.org/v"),         # case-folded suffix match
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_host_filter_block_literal(hosted):
    out = host_filter(hosted, ["bad.example"], mode="block")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]


def test_host_filter_allow_literal(hosted):
    out = host_filter(hosted, ["OK.org"], mode="allow")
    assert sorted(r.doc_id for r in out.collect()) == [4, 5]


def test_host_filter_literal_no_shuffle(hosted):
    plan = (
        host_filter(hosted, ["bad.example"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_host_filter_dataframe_blocklist(hosted, spark):
    bl = spark.createDataFrame([("bad.example",)], ["host"])
    out = host_filter(hosted, bl, mode="block")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]
    allow = host_filter(hosted, bl, mode="allow")
    assert sorted(r.doc_id for r in allow.collect()) == [1, 2]
    # the corpus side joins the resolved hosts via broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_host_filter_large_literal_routes_to_broadcast(hosted):
    # >32 literal entries auto-route through the distinct-host +
    # broadcast path (3.5x the per-row arrays_overlap at 2M rows)
    bl = ["bad.example"] + [f"noop{i}.test" for i in range(40)]
    out = host_filter(hosted, bl, mode="block")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_host_filter_empty_and_bad_mode(hosted):
    assert host_filter(hosted, [], mode="block").count() == 5
    assert host_filter(hosted, [], mode="allow").count() == 0
    with pytest.raises(ValueError):
        host_filter(hosted, ["x"], mode="keep")


def test_host_stats(crawl):
    out = {
        r.host: r
        for r in host_stats(
            crawl, lang_col="lang", size_col="doc_id"
        ).collect()
    }
    a = out["a.org"]
    assert (a.n_docs, a.n_pages, a.n_langs) == (4, 2, 2)
    assert a.mean_size == pytest.approx(2.5)
    b = out["b.org"]
    assert (b.n_docs, b.n_pages, b.n_langs) == (1, 1, 1)


def test_url_features(spark):
    from caterpillar_spark.ops import url_features

    df = spark.createDataFrame(
        [
            ("HTTPS://A.org:443/Docs/Guide/x?utm_source=f&page=2#top",),
            ("http://b.org/",),
            ("https://c.org/blog/index.html",),
            ("https://d.org/a/b/c/d/e?x=1&y=2&z=3",),
        ],
        ["url"],
    )
    got = {r.host: r for r in url_features(df).collect()}
    a = got["a.org"]
    # canonical: https://a.org/Docs/Guide/x?page=2
    assert (a.path_depth, a.n_params, a.is_https, a.is_index) == (3, 1, True, False)
    assert a.path_len == len("/Docs/Guide/x")
    b = got["b.org"]
    assert (b.path_depth, b.is_https, b.is_index, b.n_params) == (0, False, True, 0)
    c = got["c.org"]
    assert c.is_index and c.path_depth == 2
    d = got["d.org"]
    assert d.path_depth == 5 and d.n_params == 3


def test_canonical_url_review_regressions(spark):
    """Round-5 review findings: literal '&' in a query-less path must
    survive; a query value ending in '/' must survive; trailing
    path slashes before '?' still fold."""
    from caterpillar_spark.ops import canonical_url
    from pyspark.sql import functions as F

    cases = [
        # literal & in path, no query: NOT rewritten to '?'
        ("https://ex.com/news&events", "https://ex.com/news&events"),
        # tracking param mid-query: no leading-? repair needed/applied
        ("https://a.org/p?x=1&utm_source=f&y=2", "https://a.org/p?x=1&y=2"),
        # first-position tracking param: repair fires
        ("https://a.org/p?utm_source=f&y=2", "https://a.org/p?y=2"),
        # query value ending in '/': preserved
        ("https://e.com/login?redirect=/home/", "https://e.com/login?redirect=/home/"),
        ("https://e.com/p?next=/", "https://e.com/p?next=/"),
        # trailing path slashes before a query still fold
        ("https://e.com/p/?x=1", "https://e.com/p?x=1"),
        # plain trailing slash still folds
        ("https://e.com/p/", "https://e.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_host_filter_iterable_input(spark):
    """A one-shot iterable blocklist must work (materialized once)."""
    from caterpillar_spark.ops import host_filter

    df = spark.createDataFrame(
        [("https://a.org/1",), ("https://b.org/2",)], ["url"]
    )
    out = host_filter(df, iter(["a.org"]), mode="block")
    assert [r.url for r in out.collect()] == ["https://b.org/2"]
