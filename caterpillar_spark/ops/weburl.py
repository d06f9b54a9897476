"""URL-level curation operators for Common-Crawl-style web corpora.

The two crawl-side stages a web-text pipeline runs BEFORE any
content-based dedup (ops/dedup.py): collapse re-crawls of the same
page to the newest snapshot, and roll the corpus up per host for
crawl-health / domain-mix decisions.  Both operate on the input-hint
shape ``(url, warc_ts, html, text, lang)``
(``caterpillar_spark/sources/webtext.py``); the reference engine has
no crawl layer — these extend it the way a training-data pipeline
needs (SURVEY.md §6).

Everything is JVM-side column algebra — the canonicalizer is a chain
of ``regexp_replace`` over RE2-compatible patterns (no lookaround),
so the DuckDB oracle runs semantically identical expressions.

Scale notes (the 100 TB question for each):

* :func:`canonical_url` — a narrow per-row map, zero shuffles; stays
  inside whole-stage codegen.
* :func:`url_snapshot_dedup` — ONE hash shuffle on ``canonical_url``;
  the per-group window sees only the re-crawls of a single page
  (bounded by crawl frequency, typically < 100), so there is no hot
  key no matter how large the corpus.  ``row_number`` and the
  ``n_snapshots`` count share the same partitioning → one Exchange.
* :func:`host_stats` — one partial-agg shuffle keyed by host.  Giant
  hosts (wikipedia.org at 10^8 pages) are fine: every aggregate here
  is algebraic, so the map-side combine reduces each task's
  contribution to one row per host before the shuffle.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "host_of",
    "host_suffixes",
    "host_filter",
    "url_snapshot_dedup",
    "host_stats",
    "url_features",
]

# scheme://authority prefix (up to the first /, ? or #)
_PREFIX_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
# tracking query parameters, with their leading separator
_TRACKING_RE = r"[?&](utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a crawled URL (a pure, deterministic map).

    Rules, in order (each one a global RE2-safe ``regexp_replace``):

    1. lowercase the ``scheme://authority`` prefix (path/query case
       is significant on most origins and is preserved);
    2. strip the ``#fragment``;
    3. strip tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid``) with their separator; the leading-``?`` repair
       runs ONLY when the stripped param was in first position (so a
       literal ``&`` in a query-less path is never rewritten);
    4. strip default ports (``https://h:443``, ``http://h:80``);
    5. strip trailing slashes — from the end of the PATH: before the
       ``?`` when a query is present, else at the end of the URL (a
       query value ending in ``/`` is preserved).

    ``www.``-stripping and path-case folding are deliberately NOT
    applied: they change page identity on enough real origins that a
    crawl pipeline must opt in per-host.  The DuckDB oracle in
    ``__spark_entry__.py`` mirrors every step.
    """
    prefix = F.regexp_extract(url, _PREFIX_RE, 0)
    u = F.concat(F.lower(prefix), F.substr(url, F.length(prefix) + F.lit(1)))
    u = F.regexp_replace(u, r"#.*$", "")
    first_param_tracking = u.rlike(
        r"\?(utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*"
    )
    u = F.regexp_replace(u, _TRACKING_RE, "")
    u = F.when(
        first_param_tracking, F.regexp_replace(u, r"^([^?]*)&", r"$1?")
    ).otherwise(u)
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#])", r"$1$2")
    u = F.when(
        u.contains("?"), F.regexp_replace(u, r"/+\?", "?")
    ).otherwise(F.regexp_replace(u, r"/+$", ""))
    return u


def host_of(url: Column) -> Column:
    """Lowercased hostname of a URL (port and userinfo excluded)."""
    auth = F.lower(F.regexp_extract(url, _PREFIX_RE, 0))
    return F.regexp_extract(auth, r"://(?:[^/@]*@)?([^/:?#@]+)", 1)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, most-specific first.

    ``a.b.example.org`` → ``[a.b.example.org, b.example.org,
    example.org, org]``.  Bounded by the label count (realistically
    ≤ ~10), so the array is tiny; everything is JVM higher-order
    functions — no UDF, no shuffle.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def host_filter(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Domain block/allow-list filter — the crawl-curation stage that
    runs before any content look (CCNet/RefinedWeb pipelines drop
    blocklisted domains first; an allowlist is the curated-sources
    inverse).

    An entry matches a document when it equals the URL's hostname OR
    any registrable parent domain (``example.org`` blocks
    ``a.b.example.org``); sibling domains never match.

    ``blocklist`` is either

    * a SMALL ``Sequence[str]`` (≤ 32 entries) — compiled to a literal
      array and matched via ``arrays_overlap`` over
      :func:`host_suffixes`, a narrow JVM filter with ZERO shuffles
      and no extra job (streaming-friendly; 828k rows/s/16 cores at
      2M rows, scripts/weburl_scale_drive.py); or
    * a larger ``Sequence`` or a single-column ``DataFrame`` of hosts
      (up to millions of entries): resolved against the corpus'
      DISTINCT hosts first (suffixes computed once per host, not per
      row), then broadcast back — the corpus pays one narrow map +
      one broadcast join, never a shuffle (1.3M rows/s at 2M rows
      with 1k entries — 3.5× the literal path, which rebuilds the
      entry hash set per row inside ``arrays_overlap``).

    ``mode='block'`` keeps non-matching rows; ``mode='allow'`` keeps
    matching rows.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    host = host_of(F.col(url_col))
    if not isinstance(blocklist, DataFrame):
        # materialize once: a one-shot iterable must not be exhausted
        # by the size probe below
        blocklist = list(blocklist)
    if not isinstance(blocklist, DataFrame) and len(blocklist) > 32:
        blocklist = df.sparkSession.createDataFrame(
            [(h,) for h in blocklist], ["host"]
        )
    if isinstance(blocklist, DataFrame):
        (entry_col,) = blocklist.columns
        entries = blocklist.select(
            F.lower(F.col(entry_col)).alias("_hf_entry")
        ).distinct()
        # Resolve the list against the DISTINCT corpus hosts first
        # (map-side-combined agg over unique hostnames — tiny next to
        # the corpus), then broadcast the matched hosts back: the
        # corpus itself pays one narrow map + one broadcast join, no
        # shuffle.  Matched-host cardinality is bounded by the corpus'
        # distinct hosts — broadcastable for any realistic blocklist.
        hosts = df.select(host.alias("_hf_host")).distinct()
        matched = (
            hosts.select(
                "_hf_host",
                F.explode(host_suffixes(F.col("_hf_host"))).alias("_hf_one"),
            )
            .join(
                F.broadcast(entries),
                F.col("_hf_one") == F.col("_hf_entry"),
                "left_semi",
            )
            .select("_hf_host")
            .distinct()
        )
        return (
            df.withColumn("_hf_host", host)
            .join(
                F.broadcast(matched),
                "_hf_host",
                "left_semi" if mode == "allow" else "left_anti",
            )
            .drop("_hf_host")
        )
    if not blocklist:
        return df if mode == "block" else df.limit(0)
    entries_lit = F.lit([h.lower() for h in blocklist])
    hit = F.arrays_overlap(host_suffixes(host), entries_lit)
    return df.where(hit if mode == "allow" else ~hit)


def url_snapshot_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_break: Optional[str] = None,
) -> DataFrame:
    """Keep the newest crawl snapshot per canonical URL.

    The standard first stage of a Common-Crawl curation pipeline: a
    page captured in several crawls (or reachable under several
    equivalent URLs) contributes exactly one row — the one with the
    greatest ``ts_col``.  Ties break on ascending ``tie_break``
    (default: the raw URL) so the result is deterministic.

    Adds ``canonical_url`` and ``n_snapshots`` (how many raw rows
    collapsed into this one — the re-crawl ratio per page, a useful
    crawl-health signal) to the surviving rows.

    One hash shuffle on ``canonical_url``; both window functions share
    that partitioning, so Spark plans a single Exchange.
    """
    tie = tie_break or url_col
    canon = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url")
    ranked = canon.withColumn(
        "_rn",
        F.row_number().over(
            w.orderBy(F.col(ts_col).desc(), F.col(tie).asc())
        ),
    ).withColumn("n_snapshots", F.count(F.lit(1)).over(w))
    return ranked.where(F.col("_rn") == 1).drop("_rn")


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    lang_col: Optional[str] = "lang",
    size_col: Optional[str] = None,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-host crawl rollup over a web corpus.

    Returns one row per hostname: raw document count, distinct
    canonical pages (re-crawls collapsed), distinct languages, and —
    when ``size_col`` is given — the mean document size.  This is the
    table a domain-mix / blocklist decision reads; at 10^12 docs it is
    one algebraic aggregation (``n_pages`` uses exact
    ``countDistinct`` here; at extreme scale swap in
    ``approx_count_distinct`` — same plan shape, documented slot-in).
    """
    base = df.withColumn("host", host_of(F.col(url_col))).withColumn(
        "_canon", canonical_url(F.col(url_col))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_canon").alias("n_pages"),
    ]
    if lang_col is not None:
        aggs.append(F.countDistinct(lang_col).alias("n_langs"))
    if size_col is not None:
        aggs.append(F.round(F.avg(size_col), 6).alias("mean_size"))
    aggs.extend(extra_aggs)
    return base.groupBy("host").agg(*aggs)


def url_features(
    df: DataFrame,
    url_col: str = "url",
    canonicalize: bool = True,
) -> DataFrame:
    """Structural URL features for crawl-quality scoring — appended as
    columns: ``host``, ``path_depth`` (non-empty path segments),
    ``path_len`` (characters in the path), ``n_params`` (query
    parameters), ``is_https``, ``is_index`` (empty path, bare ``/``,
    or ``…/index.*`` — the section-landing-page heuristic).

    Deep paths, parameter-heavy URLs, and calendar/faceted-navigation
    traps score poorly in crawl curation; index pages get crawled
    first.  All JVM column algebra, zero shuffles; with
    ``canonicalize`` the features are computed on the canonical form
    (case, ports, fragments, tracking params folded first).
    """
    u = F.col(url_col)
    if canonicalize:
        u = canonical_url(u)
    path = F.regexp_extract(u, _PREFIX_RE + r"([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return (
        df.withColumn("host", host_of(u))
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda x: x != "")),
        )
        .withColumn("path_len", F.length(path))
        .withColumn(
            "n_params",
            F.when(query == "", F.lit(0)).otherwise(
                F.size(F.split(query, "&"))
            ),
        )
        .withColumn("is_https", u.startswith("https://"))
        .withColumn(
            "is_index",
            (path == "") | (path == "/") | path.rlike(r"/index\.[a-z]+$"),
        )
    )
