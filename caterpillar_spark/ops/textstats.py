"""Text statistics / quality / language-ID / fingerprinting operators.

All JVM-side (built-in functions + higher-order array functions); no
Python in the hot path, so these run at whole-stage-codegen speed and
scale linearly with the corpus — each operator is a narrow map over the
documents table (zero shuffles).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language function-word sets for the n-gram/stopword-ratio
#: language heuristic.  Deliberately small and SQL-reproducible.
LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is", "was", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"),
}


def tokens_col(text_col: str = "text", lowercase: bool = True) -> Column:
    """Whitespace/punctuation tokens as an array column (JVM-side).

    Splits on runs of non-alphanumerics after optional lowercasing and
    drops empty strings — the portable "simple" tokenization shared with
    the DuckDB oracles.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, "[^a-z0-9]+"), lambda t: t != "")


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counts: total, distinct, type-token ratio,
    mean token length."""
    toks = tokens_col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("ttr"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
            )
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )


def quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopword_ratio_langs: str = "en",
) -> DataFrame:
    """Heuristic document-quality features: length, alpha ratio,
    stopword ratio, repetition (1 - type/token ratio)."""
    toks = tokens_col(text_col)
    markers = list(LANG_MARKERS[stopword_ratio_langs])
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
    n = F.greatest(F.size(toks), F.lit(1))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    total_len = F.greatest(F.length(F.col(text_col)), F.lit(1))
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.round(alpha / total_len, 6).alias("alpha_ratio"),
        F.round(stop_hits / n, 6).alias("stopword_ratio"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6
        ).alias("repetition"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Function-word-ratio language guess.

    Computes per-language marker-token ratios and picks the argmax
    (ties broken by language code ascending); documents with no marker
    hits get lang_guess='und'.
    """
    toks = tokens_col(text_col)
    out = docs.select(F.col(id_col), toks.alias("_toks"))
    n = F.greatest(F.size(F.col("_toks")), F.lit(1))
    ratio_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        r = F.round(
            F.size(F.filter(F.col("_toks"), lambda t: t.isin(list(markers)))) / n, 6
        )
        ratio_cols.append(r.alias(f"ratio_{lang}"))
    out = out.select(F.col(id_col), F.size(F.col("_toks")).alias("_n"), *ratio_cols)
    # argmax via greatest + chained when (deterministic tie-break: first
    # language in sorted order wins on equal ratio).
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"ratio_{l}") for l in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(
            (best > 0) & (F.col(f"ratio_{lang}") == best), F.lit(lang)
        ).otherwise(guess)
    return out.select(
        F.col(id_col), *[F.col(f"ratio_{l}") for l in langs], guess.alias("lang_guess")
    )


#: GPT-2-style pre-tokenizer regex (public BPE pre-tokenization
#: pattern, ASCII-portable form): contraction suffixes, space-prefixed
#: letter runs, digit runs, symbol runs, whitespace runs.  Written
#: without lookahead so the Java (Spark) and RE2 (DuckDB) engines
#: match identically.
BPE_PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"
)


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counts under a BPE-ish pre-tokenizer (the unit LLM data
    budgets are denominated in) next to plain whitespace counts.

    ``bpe_tokens`` counts non-whitespace pre-token matches — an upper
    bound proxy for BPE token count before merges; ``chars_per_bpe``
    is the compression-rate signal (low values flag junk/code-like
    text).  All JVM-side: one ``regexp_extract_all`` per row, no
    shuffle.
    """
    matches = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0
    )
    non_ws = F.filter(matches, lambda m: m.rlike("\\S"))
    ws_toks = tokens_col(text_col)
    n_bpe = F.size(non_ws)
    return docs.select(
        F.col(id_col),
        F.size(ws_toks).alias("ws_tokens"),
        n_bpe.alias("bpe_tokens"),
        F.round(
            F.length(F.col(text_col)) / F.greatest(n_bpe, F.lit(1)), 6
        ).alias("chars_per_bpe"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document-quality rule flags (Rae et al. 2021,
    public filtering heuristics): word-count bounds, mean-word-length
    bounds, fraction of words containing an alphabetic character, and
    a minimum number of *distinct* common function words present.
    Emits one boolean per rule plus the conjunctive ``passes`` — the
    keep/drop decision a pretraining pipeline applies after dedup.
    Zero-shuffle narrow map, whole-stage codegen."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    ) / n1
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n1
    markers = list(LANG_MARKERS["en"])
    stop_hits = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(markers)))
    )
    ok_words = (n >= min_words) & (n <= max_words)
    ok_len = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_alpha = alpha_frac >= min_alpha_word_frac
    ok_stop = stop_hits >= min_stop_hits
    return docs.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_word_count"),
        ok_len.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_len & ok_alpha & ok_stop).alias("passes"),
    )


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source crawl-health rollup: document count, mean character
    length, distinct languages, and exact-duplicate fraction
    (1 − distinct content fingerprints / docs — the same normalized
    md5 fingerprint :func:`fingerprints` and exact dedup use).  The
    view a crawl operator ranks hosts/dumps by before deciding what to
    drop wholesale.

    One partial-aggregated ``groupBy`` keyed by source (the distinct
    counts add their internal expand — still source-keyed, no skewable
    hot key beyond a genuinely dominant source; at 10^12 docs swap the
    exact distincts for ``approx_count_distinct`` if ±2% is
    acceptable)."""
    toks = tokens_col(text_col)
    fp = F.md5(F.concat_ws(" ", toks))
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.length(text_col).alias("_chars"),
            F.col(lang_col).alias("_lang"),
            fp.alias("_fp"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_chars"), 6).alias("mean_chars"),
            F.countDistinct("_lang").alias("n_langs"),
            F.round(
                1.0 - F.countDistinct("_fp") / F.count(F.lit(1)), 6
            ).alias("dup_frac"),
        )
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngrams: Sequence[int] = (1, 2),
    dup_ngrams: Sequence[int] = (3,),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): for
    each ``n`` in ``top_ngrams`` the fraction of n-gram instances taken
    by the single most frequent n-gram (``top_{n}gram_frac``), and for
    each ``n`` in ``dup_ngrams`` the fraction of n-gram instances whose
    n-gram occurs more than once (``dup_{n}gram_frac``) — the
    boilerplate/templated-page detectors that complement
    :func:`gopher_quality_flags`' length/stopword rules.  Also emits
    ``n_tokens``.

    Shape at scale: ONE pass builds every requested gram size as a
    struct array JVM-side (higher-order functions), a single explode
    feeds two partial-aggregated ``groupBy`` stages both keyed by
    ``doc_id`` — cost linear in corpus tokens × len(gram sizes), no
    skew (keys are documents), no Python.
    """
    sizes = sorted(set(top_ngrams) | set(dup_ngrams))
    if not sizes or min(sizes) < 1:
        raise ValueError("gram sizes must be >= 1")
    if 1 not in sizes:
        sizes = [1] + sizes  # unigram totals define n_tokens

    def gram_expr(g: int) -> str:
        # positions 1..size-g+1; the greatest() guard keeps sequence()
        # ascending on empty docs, the filter drops out-of-range starts
        return (
            f"transform(filter(sequence(1, greatest(size(toks), 1)), "
            f"i -> i + {g - 1} <= size(toks)), "
            f"i -> struct({g} AS gs, concat_ws(' ', slice(toks, i, {g})) AS gram))"
        )

    exploded = (
        docs.select(
            F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
        )
        .select(
            "doc_id",
            F.explode_outer(
                F.concat(*[F.expr(gram_expr(g)) for g in sizes])
            ).alias("g"),
        )
        .select("doc_id", F.col("g.gs").alias("gs"), F.col("g.gram").alias("gram"))
    )
    counts = exploded.groupBy("doc_id", "gs", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_size = counts.groupBy("doc_id", "gs").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("tot"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup"),
    )
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("gs") == 1, F.col("tot"))), F.lit(0)
        ).alias("n_tokens")
    ]
    for g in top_ngrams:
        aggs.append(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(F.col("gs") == g, F.col("mx") / F.col("tot"))
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"top_{g}gram_frac")
        )
    for g in dup_ngrams:
        aggs.append(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(F.col("gs") == g, F.col("dup") / F.col("tot"))
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"dup_{g}gram_frac")
        )
    return per_size.groupBy("doc_id").agg(*aggs)


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic document fingerprints.

    ``content_fp``: md5 of whitespace-normalized lowercase text (exact
    dedup key).  ``bag_fp``: md5 of the sorted distinct token set —
    order/multiplicity-insensitive, catches shuffled-token duplicates.
    """
    toks = tokens_col(text_col)
    norm = F.concat_ws(" ", toks)
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("content_fp"),
        F.md5(bag).alias("bag_fp"),
    )


def corpus_keyness(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood keyness between two corpora — the
    standard corpus-comparison / drift statistic (Dunning 1993; Rayson
    & Garside 2000): which terms are significantly over-represented in
    corpus A relative to corpus B?  The training-pipeline use is crawl
    drift — compare this month's snapshot against last month's and
    surface the vocabulary shift.

    For each term with combined count >= ``min_count``:
    ``G2 = 2 * (a*ln(a/E1) + b*ln(b/E2))`` where ``a``/``b`` are the
    term's token counts in A/B, ``E1 = tA*(a+b)/(tA+tB)`` and
    ``E2 = tB*(a+b)/(tA+tB)`` the expected counts under the
    null (same rate in both), ``tA``/``tB`` the corpus token totals.
    Zero-count sides contribute 0 (the ``x*ln(x)`` limit).  Returns
    ``(term, count_a, count_b, g2, overused_in)``.

    Scale shape: one explode + term-keyed partial aggregation per side,
    one full-outer equi-join on term, scalar totals carried as a
    broadcast 1-row crossJoin — at 10^12 tokens this is two
    shuffles on a vocabulary-sized relation; nothing driver-side.
    """
    def counts(docs):
        return (
            docs.select(F.explode(tokens_col(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    ca = counts(docs_a)
    cb = counts(docs_b)
    tot_a = ca.agg(F.sum("n").alias("ta"))
    tot_b = cb.agg(F.sum("n").alias("tb"))
    joined = (
        ca.withColumnRenamed("n", "count_a")
        .join(cb.withColumnRenamed("n", "count_b"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("count_a", F.lit(0)).cast("long").alias("count_a"),
            F.coalesce("count_b", F.lit(0)).cast("long").alias("count_b"),
        )
        .where(F.col("count_a") + F.col("count_b") >= F.lit(min_count))
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
    )
    a, b = F.col("count_a"), F.col("count_b")
    ta, tb = F.col("ta").cast("double"), F.col("tb").cast("double")
    e1 = ta * (a + b) / (ta + tb)
    e2 = tb * (a + b) / (ta + tb)
    term_ll = (
        F.when(a > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
        + F.when(b > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    )
    return joined.select(
        "term",
        "count_a",
        "count_b",
        F.round(2.0 * term_ll, 6).alias("g2"),
        F.when(a / ta > b / tb, F.lit("a")).otherwise(F.lit("b")).alias(
            "overused_in"
        ),
    )


#: PII detection patterns — deliberately conservative and portable:
#: the same expressions run under Java regex (Spark) and RE2 (DuckDB
#: oracles), so no lookbehind, no backslash classes.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "phone": "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": "([0-9]{1,3}[.]){3}[0-9]{1,3}",
}


def pii_scan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: Dict[str, str] = None,
    redact: bool = True,
) -> DataFrame:
    """Rule-based PII detection and redaction — the pre-training
    compliance stage (emails, phone numbers, IP addresses by default;
    ``patterns`` swaps in stricter sets).  Returns one row per
    document: a match count per PII type, ``n_pii`` total, and (with
    ``redact``) ``text`` with every match replaced by ``[TYPE]``.

    A narrow JVM map over the scan — zero shuffles, linear in corpus
    size, whole-stage-codegen regex evaluation.  The default patterns
    are deliberately high-precision/portable rather than exhaustive;
    production sets (NER models, checksum-validated IDs) slot into the
    same column shape via ``patterns`` or an Arrow UDF upstream.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    counts = {
        # group 0 = the whole match (Spark's default idx is 1, which
        # would error on group-less patterns and disagree with the
        # DuckDB oracle's default)
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        for name, pat in pats.items()
    }
    cols = [F.col(id_col)]
    total = None
    for name, c in counts.items():
        c = c.cast("int")
        cols.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.cast("int").alias("n_pii"))
    if redact:
        red = F.col(text_col)
        for name, pat in pats.items():
            red = F.regexp_replace(red, pat, f"[{name.upper()}]")
        cols.append(red.alias("text"))
    return docs.select(*cols)
