"""Documents -> frames: the analysis pipeline entry point.

Re-expresses the reference build path (processing/index.py:346-511) as a
Spark transformation: each TEXT field of each document is split into
paragraphs, sentences, and then *frames* of ``frame_size`` consecutive
sentences; each frame carries a term -> [positions] vector produced by
the analyser chain.  The per-frame token-position semantics match the
reference exactly (index.py:458-470): stop-marked tokens advance the
position counter but are not recorded; tokens dropped by the
punctuation filter never reach the counter.

Differences from the reference (deliberate, documented):

* Frame identity.  The reference assigns monotone integer doc/frame ids
  at commit time inside SQLite (single-writer).  A distributed build
  cannot do that cheaply, so frames are keyed by the stable pair
  ``(doc_id, frame_seq)``; ``doc_id`` is the caller's stable document
  key (a long) or, for keyless web corpora, ``xxhash64(url)`` — see
  :func:`with_doc_id`.  All orderings/tie-breaks use this pair, so
  results are deterministic under any partitioning.
* The reference's ``_sequence_number`` is always 0 (an unincremented
  counter, index.py:394+451); we store the real frame ordinal since
  distributed ordering must be explicit.
* Sentence segmentation is rule-based (see analysis/sentence.py) since
  NLTK Punkt is unavailable — byte-exact vs the reference's stored
  punkt output on its alice fixture (1153/1153 frames and vectors).

Scale notes: the whole transformation is embarrassingly parallel (one
``mapInPandas`` pass, no shuffle); Arrow batches keep the Python work
vectorized per-batch; output column pruning applies because the UDF
output schema is explicit.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from caterpillar_spark.analysis.analyser import Analyser, DefaultAnalyser
from caterpillar_spark.analysis.sentence import split_sentences
from caterpillar_spark.analysis.tokenize import ParagraphTokenizer

_PARAGRAPHS = ParagraphTokenizer()


def analyse_text(
    text: str, analyser: Analyser, frame_size: int = 2
) -> List[Tuple[int, str, Dict[str, List[int]], int]]:
    """Pure-Python frame extraction for one document's TEXT field.

    Returns ``[(frame_seq, frame_text, {term: [positions]}, n_positions)]``.
    This is the single source of truth for analysis semantics — the Spark
    pipeline and the unit tests both call it.
    """
    if text is None:
        return []
    frames: List[Tuple[int, str, Dict[str, List[int]], int]] = []
    seq = 0
    if frame_size > 0:
        paragraphs = (t.value for t in _PARAGRAPHS.tokenize(text))
    else:
        paragraphs = iter([text])
    for para in paragraphs:
        if frame_size > 0:
            sentences = split_sentences(para)
            windows = [
                sentences[i : i + frame_size]
                for i in range(0, len(sentences), frame_size)
            ]
        else:
            windows = [[para]]
        for sentence_list in windows:
            positions: Dict[str, List[int]] = {}
            token_position = 0
            for sentence in sentence_list:
                for token in analyser.analyse(sentence):
                    if not token.stopped:
                        positions.setdefault(token.value, []).append(token_position)
                    token_position += 1
            frames.append((seq, " ".join(sentence_list), positions, token_position))
            seq += 1
    return frames


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("field", StringType(), False),
        StructField("frame_seq", IntegerType(), False),
        StructField("frame_text", StringType(), True),
        StructField(
            "terms",
            ArrayType(
                StructType(
                    [
                        StructField("term", StringType(), False),
                        StructField("freq", IntegerType(), False),
                        StructField("positions", ArrayType(IntegerType()), False),
                    ]
                )
            ),
            False,
        ),
        StructField("frame_tokens", IntegerType(), False),
    ]
)


def with_doc_id(df: DataFrame, key_col: str = "url") -> DataFrame:
    """Derive a stable 64-bit ``doc_id`` from a string document key.

    For keyless web corpora.  Collision odds at 10^12 docs are ~2.7e4
    expected pairs over the full 64-bit space; for exact-dedup-critical
    work carry the key column through instead (the engine tie-breaks on
    ``(doc_id, frame_seq)`` and never *merges* distinct keys, so a
    collision can only conflate two documents' scores, not corrupt the
    index structure).
    """
    return df.withColumn("doc_id", F.xxhash64(F.col(key_col)))


def build_frames(
    df: DataFrame,
    text_cols: Sequence[str] = ("text",),
    doc_id_col: str = "doc_id",
    analyser: Optional[Analyser] = None,
    frame_size: int = 2,
    metadata_cols: Sequence[str] = (),
    store_text: bool = True,
) -> DataFrame:
    """documents DataFrame -> frames DataFrame.

    One output row per (document, TEXT field, frame).  ``metadata_cols``
    are document-level structured fields denormalized onto every frame
    (the reference injects ``_metadata`` into each frame,
    index.py:446-452) — at scale this denormalization is what lets
    metadata predicates prune without a join.
    """
    analyser = analyser or DefaultAnalyser()
    meta = list(metadata_cols)
    out_schema = StructType(
        FRAME_SCHEMA.fields + [df.schema[c] for c in meta]
    )
    cols = [doc_id_col, *text_cols, *meta]
    src = df.select(*cols)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                doc_id = rec[doc_id_col]
                meta_vals = [rec[c] for c in meta]
                for field in text_cols:
                    for seq, ftext, positions, n_tokens in analyse_text(
                        rec[field], analyser, frame_size
                    ):
                        terms = [
                            (t, len(ps), ps) for t, ps in positions.items()
                        ]
                        rows.append(
                            (
                                doc_id,
                                field,
                                seq,
                                ftext if store_text else None,
                                terms,
                                n_tokens,
                                *meta_vals,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return src.mapInPandas(process, schema=out_schema)


def frames_to_postings(frames: DataFrame) -> DataFrame:
    """frames -> postings: one row per (term, frame).

    The positional inverted-index relation (reference "positions index",
    index.py:15-22).  ``doc_id``/``field``/metadata stay denormalized so
    query-time field scoping and doc rollups need no extra join
    (the reference needs postings ⋈ frame ⋈ field, sqlite.py:1370-1376).
    """
    passthrough = [
        c
        for c in frames.columns
        if c not in ("terms", "frame_text")
    ]
    return frames.select(
        *passthrough, F.explode("terms").alias("_t")
    ).select(
        *passthrough,
        F.col("_t.term").alias("term"),
        F.col("_t.freq").alias("freq"),
        F.col("_t.positions").alias("positions"),
    )
