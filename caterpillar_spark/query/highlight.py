"""Snippet/highlight support: exact term-occurrence offsets in stored text.

Beyond-reference serving surface (the reference stores frames and
returns them whole; UI-side highlighting is left to the caller —
here the engine emits the (token position, character offset) pairs a
renderer needs, computed exactly from the stored text itself so they
are valid against what the user sees, independent of analyser position
advances).

Scale shape: the ranked top-k relation is k rows — it broadcast-joins
into the stored-text relation (a point-lookup join against the
doc-store layout; at 100 TB the stored side is doc_id-partitioned so
the join prunes to the touched partitions).  Offset extraction is a
row-local higher-order-function pass over the k joined rows — no
shuffle, no Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["term_occurrences", "highlight_search"]


def term_occurrences(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    keep: Sequence[str] = ("doc_id",),
    snippet_window: Optional[int] = None,
) -> DataFrame:
    """Occurrences of ``terms`` in ``text_col`` as one row per match:
    ``(*keep, term, pos, char_offset[, snippet])``.

    ``pos`` is the 0-based whitespace-token index; ``char_offset`` the
    0-based character offset of the token in the stored string (exact
    for ANY whitespace — newlines/tabs/runs split tokens like single
    spaces do, and offsets are computed from the original pieces, so a
    renderer can slice the stored string directly; the r4 advisory:
    the single-space split missed terms adjacent to '\\n').  Matching
    is case-insensitive equality on whitespace tokens.
    ``snippet_window=w`` adds the ±w-token context string around each
    hit, single-space joined (row-local slice of the stored tokens —
    the "keyword in context" a result page shows).
    """
    terms = [t.lower() for t in terms]
    # Split BEFORE each whitespace char: every piece is one optional
    # leading whitespace char + a (possibly empty) non-ws run, so the
    # original string is the exact concatenation of the pieces and
    # offsets come from cumulative piece lengths — all JVM HOFs.
    pieces = F.split(F.col(text_col), r"(?=\s)")
    toks = F.filter(
        F.transform(
            pieces,
            lambda x, i: F.struct(
                F.regexp_replace(x, r"^\s+", "").alias("tok"),
                i.alias("idx"),
            ),
        ),
        lambda s: s["tok"] != "",
    )
    indexed = F.transform(
        toks,
        lambda s, i: F.struct(
            s["tok"].alias("tok"), i.alias("pos"), s["idx"].alias("idx")
        ),
    )
    hits = F.filter(indexed, lambda s: F.lower(s["tok"]).isin(terms))
    out = df.select(
        *keep,
        pieces.alias("_pieces"),
        F.transform(toks, lambda s: s["tok"]).alias("_toks"),
        F.explode(hits).alias("_h"),
    )
    pos = F.col("_h.pos")
    piece = F.element_at(F.col("_pieces"), F.col("_h.idx") + 1)
    char_offset = (
        F.length(F.concat_ws("", F.slice(F.col("_pieces"), 1, F.col("_h.idx"))))
        + (F.length(piece) - F.length(F.col("_h.tok")))
    )
    cols = [
        *keep,
        F.lower(F.col("_h.tok")).alias("term"),
        pos.alias("pos"),
        char_offset.cast("int").alias("char_offset"),
    ]
    if snippet_window is not None:
        if snippet_window < 0:
            raise ValueError("snippet_window must be >= 0")
        w = int(snippet_window)
        start1 = F.greatest(pos + 1 - w, F.lit(1))
        end1 = F.least(pos + 1 + w, F.size("_toks"))
        cols.append(
            F.concat_ws(
                " ", F.slice(F.col("_toks"), start1, end1 - start1 + 1)
            ).alias("snippet")
        )
    return out.select(*cols)


def highlight_search(
    index,
    stored: DataFrame,
    k: int = 10,
    text_col: str = "text",
    unit: str = "document",
    snippet_window: Optional[int] = None,
    **search_kw,
) -> DataFrame:
    """Ranked retrieval + highlight offsets in ONE relation:
    ``(doc_id[, field, frame_seq], score, term, pos, char_offset)``.

    ``stored`` is the stored-text relation keyed like the search unit
    (``InvertedIndex.stored_documents()`` for unit='document', or the
    frames relation with ``text_col='frame_text'`` for unit='frame').
    The positive query terms (must/should/at_least_n, variants
    flattened) are the highlight targets.
    """
    from caterpillar_spark.query.engine import _groups, search

    rows = _groups(
        search_kw.get("must", ()),
        search_kw.get("should", ()),
        search_kw.get("at_least_n") or None,
        (),
    )
    terms = sorted({t for (t, _gid, kind) in rows if kind != "exclude"})
    if not terms:
        raise ValueError("no positive terms to highlight")
    top = search(index, k=k, unit=unit, **search_kw)
    keys = [c for c in top.columns if c != "score"]
    joined = F.broadcast(top).join(stored, on=keys)
    return term_occurrences(
        joined,
        terms,
        text_col=text_col,
        keep=[*keys, "score"],
        snippet_window=snippet_window,
    )
