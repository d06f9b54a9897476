"""Common-Crawl-style webtext source (BASELINE.json ``input_hint``).

Input table shape, exactly::

    url:      string     -- document identity (the reference's ID field)
    warc_ts:  timestamp  -- crawl capture time (DATETIME metadata analog)
    html:     binary     -- raw page bytes, carried but not indexed
                            (stored=True, indexed=False analog,
                            reference processing/schema.py:44-47)
    text:     string     -- extracted page text, the single indexed TEXT
                            field (reference schema.py:181-189)
    lang:     string     -- CATEGORICAL_TEXT metadata analog

Three operators:

* :func:`synthetic_webtext` — deterministic distributed corpus
  generator (seeded per-document RNG, independent of partitioning) used
  for tests and benchmarks in this sandbox; word frequencies are
  Zipfian so hot-term skew is exercised the way a real crawl would.
* :func:`extract_text` — vectorized html -> text extraction.  Per-row
  invariant (input_hint): the extracted text is byte-identical to the
  ``text`` column for every url; asserted in tests/test_webtext.py.
* :func:`ingest_webtext` — webtext table -> engine document table
  (stable ``doc_id`` from url via xxhash64, framing metadata attached).

Scale notes: generation and extraction are single-pass ``mapInPandas``/
``pandas_udf`` jobs — no shuffle, linear scaling with input splits; the
per-document RNG is keyed on (seed, doc ordinal) so the output is
bit-identical under any partitioning or executor count, which is what
makes restarts and the two-cluster-size scaling runs comparable.
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEBTEXT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

# Deterministic vocabularies.  A small head of function words per
# language (drives the language-id signal and the Zipf head) plus a
# shared synthetic tail ("termNNN") for vocabulary breadth.
_HEAD = {
    "en": ("the a of and in to is was for with spark join table vector "
           "stream hash index query data page".split()),
    "de": ("der die das und ist ein eine mit von zu daten seite index "
           "tabelle strom".split()),
    "es": ("el la de que y en un una los las datos tabla indice "
           "consulta flujo".split()),
    "fr": ("le la les de et un une est que dans donnees table index "
           "requete flux".split()),
}
_TAIL_SIZE = 4000
_LANGS = ("en", "en", "en", "en", "en", "en", "de", "es", "fr", "en")
_EPOCH = np.datetime64("2025-01-01T00:00:00")


def _gen_doc(seed: int, i: int, n_docs: int = 0):
    """One deterministic document: (url, warc_ts, html, text, lang).

    In-content outlinks: a deterministic subset of words is wrapped in
    ``<a href>`` anchors pointing at other synthetic pages by ORDINAL
    (Zipf-hot — page 0 is the corpus "homepage" and collects most
    inlinks, like real crawl graphs).  When ``n_docs`` is known,
    targets are drawn mostly inside the corpus (so the anchor → page
    join is populated) with a tail of dangling out-of-corpus targets;
    anchors wrap EXISTING words, so tag-stripping extraction stays
    byte-identical to the ``text`` column (the input_hint invariant);
    ~1/4 of hrefs are site-relative paths to exercise link resolution.
    """
    rng = np.random.default_rng([seed, i])
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    head = _HEAD[lang]
    n_paras = int(rng.integers(1, 4))
    paras = []
    html_paras = []
    for _ in range(n_paras):
        n_sents = int(rng.integers(1, 6))
        sents = []
        html_sents = []
        for _ in range(n_sents):
            n_words = int(rng.integers(4, 14))
            words = []
            for _ in range(n_words):
                # Zipf-skewed draw: head words are hot, tail is long.
                r = min(int(rng.zipf(1.35)) - 1, len(head) + _TAIL_SIZE - 1)
                words.append(head[r] if r < len(head) else f"term{r - len(head)}")
            words[0] = words[0][0].upper() + words[0][1:]
            words[-1] = words[-1] + "."
            html_words = []
            for w in words:
                ew = _htmlmod.escape(w)
                if rng.random() < 0.08:
                    # Zipf-hot target ordinal; 10% dangling tail when
                    # the corpus size is known
                    cap = (n_docs * 10 if n_docs else 100_000) - 1
                    t = min(int(rng.zipf(1.3)) - 1, cap)
                    if n_docs and t >= n_docs and rng.random() < 0.9:
                        t = t % n_docs
                    # site-relative form only when the target really
                    # lives on THIS page's site — a relative href
                    # resolves against the source host, so any other
                    # choice would point at a nonexistent page
                    if rng.random() < 0.25 and t % 997 == i % 997:
                        href = f"/page/{t}"
                    else:
                        href = f"https://site-{t % 997}.example.org/page/{t}"
                    ew = f'<a href="{href}">{ew}</a>'
                html_words.append(ew)
            sents.append(" ".join(words))
            html_sents.append(" ".join(html_words))
        paras.append(" ".join(sents))
        html_paras.append(" ".join(html_sents))
    text = "\n\n".join(paras)
    url = f"https://site-{i % 997}.example.org/page/{i}"
    body = "".join(f"<p>{p}</p>" for p in html_paras)
    html = (
        f"<html><head><title>{_htmlmod.escape(url)}</title>"
        f'<script>var x={i};</script></head>'
        f"<body>{body}</body></html>"
    ).encode("utf-8")
    ts = _EPOCH + np.timedelta64(i, "s")
    return url, pd.Timestamp(ts), html, text, lang


def synthetic_webtext(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Deterministic synthetic Common-Crawl-style table (exact
    ``input_hint`` shape).  Distributed: generation happens inside
    ``mapInPandas`` over ``spark.range``; identical output for any
    ``partitions``."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_doc(seed, int(i), n_docs) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return ids.mapInPandas(gen, schema=WEBTEXT_SCHEMA)


_RE_DROP = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_RE_BODY = re.compile(r"(?is)<body\b[^>]*>(.*)</body>")
_RE_BLOCK = re.compile(r"(?is)</(p|div|h[1-6]|li|tr)>")
_RE_TAG = re.compile(r"(?s)<[^>]+>")


def _extract_one(raw) -> str:
    if raw is None:
        return ""
    page = bytes(raw).decode("utf-8", errors="replace")
    page = _RE_DROP.sub("", page)
    m = _RE_BODY.search(page)
    if m:
        page = m.group(1)
    page = _RE_BLOCK.sub("\n\n", page)
    page = _RE_TAG.sub("", page)
    blocks = [b.strip() for b in page.split("\n\n")]
    return "\n\n".join(_htmlmod.unescape(b) for b in blocks if b)


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    """html binary -> visible text, as a vectorized pandas UDF
    (Arrow-batched; no per-row Python at the driver).  Drops
    script/style, keeps <body>, turns block-element closes into
    paragraph breaks, strips remaining tags, unescapes entities."""

    @F.pandas_udf(StringType())
    def _extract(col: pd.Series) -> pd.Series:
        return col.map(_extract_one)

    return df.withColumn(out_col, _extract(F.col(html_col)))


def read_webtext(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Load the webtext table from Iceberg when a catalog is configured
    (the input_hint's nominal storage), else parquet.

    Iceberg jars aren't bundled in every environment, so this probes:
    a dotted name is treated as an Iceberg/catalog table reference,
    a path as a parquet directory.  Either way the result has the
    WEBTEXT_SCHEMA shape.
    """
    if "/" not in path_or_table and "." in path_or_table:
        try:
            return spark.read.format("iceberg").load(path_or_table)
        except Exception:
            try:
                return spark.table(path_or_table)
            except Exception:
                # a dotted RELATIVE path like 'data.parquet' is a
                # parquet directory, not a catalog table
                return spark.read.parquet(path_or_table)
    return spark.read.parquet(path_or_table)


def ingest_webtext(
    df: DataFrame,
    with_anchors: bool = False,
    max_anchors_per_target: Optional[int] = 64,
) -> DataFrame:
    """Webtext table -> engine document table.

    ``doc_id = xxhash64(url)`` (stable distributed identity — see
    framing.with_doc_id); ``warc_ts``/``lang`` become document metadata
    columns; ``html`` is dropped (stored-not-indexed analog).  Feed the
    result to :func:`caterpillar_spark.framing.build_frames` with
    ``metadata_cols=["lang"]`` (and/or ``warc_ts``).

    ``with_anchors=True`` adds the web-ranking field: each page's
    INCOMING anchor text (extracted from the corpus' stored HTML,
    rolled up per target with the hot-page star cap, joined back by
    URL; pages with no inlinks get ``''``).  Feed
    ``text_cols=["text", "anchor"]`` plus
    ``field_boosts={"anchor": w}`` at query time for BM25F-over-
    anchors retrieval.  Cost: the extraction pass + one dst-keyed
    rollup + one url-keyed join — no change to the text path.
    """
    from caterpillar_spark.framing import with_doc_id

    out = with_doc_id(df, "url").select(
        "doc_id", "url", "text", "lang", "warc_ts"
    )
    if with_anchors:
        from caterpillar_spark.ops.linkgraph import (
            anchor_text_rollup,
            extract_anchor_texts,
        )

        anchors = anchor_text_rollup(
            extract_anchor_texts(df),
            max_anchors_per_target=max_anchors_per_target,
        ).select(
            F.col("dst_url").alias("url"),
            F.col("anchor_text").alias("anchor"),
            "n_anchors",
        )
        out = out.join(anchors, "url", "left").select(
            "doc_id", "url", "text", "lang", "warc_ts",
            F.coalesce("anchor", F.lit("")).alias("anchor"),
            F.coalesce("n_anchors", F.lit(0)).alias("n_anchors"),
        )
    return out
