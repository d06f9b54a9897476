"""Result-set composition algebra.

Semantics spec: reference ``caterpillar/composition.py`` — result sets
are {id: [score, ...]} dicts composed with match_all / match_any /
exclude / boost and finally ``score_and_rank``.  Here a result set is a
DataFrame with key column(s) plus a ``scores: array<double>`` column;
the list-of-scores representation is kept so composition is associative
exactly like the reference (scores concatenate, aggregation happens
once at ranking time).

Use :func:`from_scored` to lift a ``filter_frames`` output (scalar
``score``) into a result set.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F


def _keys(rs: DataFrame) -> List[str]:
    return [c for c in rs.columns if c != "scores"]


def from_scored(df: DataFrame, score_col: str = "score") -> DataFrame:
    """Lift (keys..., score) to (keys..., scores array)."""
    keys = [c for c in df.columns if c != score_col]
    return df.select(*keys, F.array(F.col(score_col)).alias("scores"))


def match_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Intersection on keys; score lists concatenate
    (reference composition.py:52-67)."""
    keys = _keys(a)
    return (
        a.alias("a")
        .join(b.alias("b"), keys, "inner")
        .select(*keys, F.concat(F.col("a.scores"), F.col("b.scores")).alias("scores"))
    )


def match_any(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union on keys; a missing side contributes no scores
    (reference composition.py:70-89)."""
    keys = _keys(a)
    empty = F.array().cast("array<double>")
    return (
        a.alias("a")
        .join(b.alias("b"), keys, "full_outer")
        .select(
            *keys,
            F.concat(
                F.coalesce(F.col("a.scores"), empty),
                F.coalesce(F.col("b.scores"), empty),
            ).alias("scores"),
        )
    )


def exclude(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set difference on keys (reference composition.py:92-99)."""
    return a.join(b, _keys(a), "left_anti")


def boost(a: DataFrame, factor: float) -> DataFrame:
    """Multiply all scores (reference composition.py:102-104)."""
    return a.withColumn(
        "scores", F.transform("scores", lambda x: x * F.lit(float(factor)))
    )


def score_and_rank(
    rs: DataFrame, limit: int = 25, start: int = 0, agg: str = "sum"
) -> DataFrame:
    """Aggregate each key's score list and rank: score desc, keys asc
    (ascending-id tie-break, reference composition.py:107-123), sliced
    to [start, start+limit).

    The offset is applied by over-fetching ``start+limit`` through
    Spark's top-k (TakeOrderedAndProject) — cheap for pagination-depth
    offsets, no global sort.
    """
    keys = _keys(rs)
    if agg == "sum":
        score = F.aggregate("scores", F.lit(0.0), lambda acc, x: acc + x)
    elif agg == "max":
        score = F.array_max("scores")
    elif agg == "avg":
        score = F.aggregate("scores", F.lit(0.0), lambda a, x: a + x) / F.size("scores")
    else:
        raise ValueError(f"unknown agg {agg!r}")
    scored = rs.select(*keys, score.alias("score"))
    order = [F.desc("score")] + [F.asc(c) for c in keys]
    top = scored.orderBy(*order).limit(start + limit)
    if start:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order)
        top = (
            top.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > start)
            .drop("_rn")
        )
    return top
