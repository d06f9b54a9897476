"""Hybrid lexical+semantic retrieval via reciprocal-rank fusion (RRF).

The modern retrieval default (Cormack et al. 2009; what hybrid search
in Elasticsearch/Vespa ships): fuse a BM25 top-``depth`` list with an
embedding-similarity top-``depth`` list by summing ``1/(rrf_k+rank)``
per document — scale-free, so the two engines' incomparable score
distributions need no calibration.

Scale shape: the inputs are ALREADY top-``depth`` relations (the
engine's TakeOrderedAndProject / ANN probes do the corpus-scale work),
so the global rank windows here run over ≤depth rows per list — the
single-partition window is on dozens of rows, not the corpus — and
fusion is one tiny groupBy.

Determinism contract: ranks are assigned over (score rounded to 6
decimals desc, id asc).  Rounding before ranking makes the fused
result reproducible across engines (summation-order float jitter in
the underlying scores cannot flip a rank), which is what the DuckDB
oracle certifies.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rrf_fuse", "hybrid_topk"]


def rrf_fuse(
    lists: Sequence[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Fuse ranked lists into ``(id_col, rrf_score)`` top-``k``.

    Each input holds ``id_col`` plus ONE score column (any name);
    higher is better.  A document missing from a list simply
    contributes nothing for it.  Inputs must already be top-depth
    cuts — the rank window is global by design (see module note).
    """
    if not lists:
        raise ValueError("need at least one ranked list")
    ranked = []
    for df in lists:
        score_cols = [c for c in df.columns if c != id_col]
        if len(score_cols) != 1:
            raise ValueError(
                f"expected ({id_col}, <score>) relation, got {df.columns}"
            )
        w = Window.orderBy(
            F.desc(F.round(F.col(score_cols[0]), 6)), F.asc(id_col)
        )
        ranked.append(
            df.select(F.col(id_col), F.row_number().over(w).alias("rank"))
        )
    u = reduce(lambda a, b: a.unionByName(b), ranked)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(1.0 / (F.lit(float(rrf_k)) + F.col("rank"))), 6
            ).alias("rrf_score")
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_topk(
    index,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    scorer: str = "bm25",
    id_col: str = "vec_id",
    semantic: Optional[DataFrame] = None,
) -> DataFrame:
    """BM25 ⊕ embedding-cosine hybrid top-``k`` over documents whose
    ids align with the embedding ids.  ``semantic`` overrides the
    dense list (e.g. :func:`caterpillar_spark.ops.ann_topk` or
    ``ann_ivf_topk`` output at scale — brute-force cosine is the exact
    default)."""
    from caterpillar_spark.ops.similarity import cosine_topk
    from caterpillar_spark.query.engine import search

    lex = search(
        index, should=list(terms), k=depth, unit="document", scorer=scorer
    )
    if semantic is None:
        semantic = cosine_topk(embeddings, query_vec, k=depth, id_col=id_col)
    sem = semantic.withColumnRenamed(id_col, "doc_id")
    return rrf_fuse([lex, sem], id_col="doc_id", k=k, rrf_k=rrf_k)
