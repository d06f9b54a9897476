"""Frame/document vector extraction, inversion and scan operators.

Reference parity:

* :func:`tf_vectors` — frame/document term-frequency vector extraction,
  ``IndexReader.get_frame_vectors`` semantics (processing/index.py:
  1104-1131; storage/sqlite.py:814-868, weighting='tf').
* :func:`vocabulary` — term dictionary ordered highest-total-frequency
  first with dense ids (the reference's vocabulary-id assignment order,
  storage/_sqlite_scripts.py:199-209).
* :func:`metadata_inversion` — (field, value) -> [ids] streaming group
  (storage/sqlite.py:870-994; processing/index.py:858-946).
* :func:`filter_range` — keyset range scan: ``id > start AND id <=
  end`` with deterministic order + limit (processing/index.py:
  1133-1155; storage/sqlite.py:1049-1101).
* :func:`attribute_filter` — conjunctive frame-attribute predicate over
  a side attributes relation, conjunction via intersection
  (processing/index.py:1330-1380; storage/sqlite.py:1476-1552).

All are plain DataFrame plans — Catalyst handles pushdown/pruning; the
only shuffle in each is the one its semantics require (a groupBy or a
semi-join).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def tf_vectors(postings: DataFrame, unit: str = "frame") -> DataFrame:
    """Term-frequency vectors: one row per frame (or document) with a
    sorted array<struct<term,freq>> — sorted so downstream hashing and
    comparisons are deterministic."""
    if unit == "document":
        base = postings.groupBy("doc_id", "term").agg(
            F.sum("freq").cast("int").alias("freq")
        )
        keys = ["doc_id"]
    else:
        base = postings.select("doc_id", "frame_seq", "term", "freq")
        keys = ["doc_id", "frame_seq"]
    return base.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct("term", "freq"))).alias("vector")
    )


def vocabulary(postings: DataFrame) -> DataFrame:
    """Term dictionary with dense ids assigned frequency-descending
    (ties broken by term asc for determinism).  The reference gives hot
    terms small ids for locality; here the ordering is informational —
    locality comes from the block layout instead.

    Dense-id assignment is ``zipWithIndex`` over a *range-partitioned*
    global sort: every partition sorts its key range in parallel and
    ids are offset by the partition-size prefix sums (one extra count
    job) — no single-partition Exchange anywhere, so this survives
    hapax-heavy web vocabularies (>10^8 terms) that a global
    ``row_number()`` window cannot.  Ids start at 1 and follow the sort
    order exactly; the call is eager (zipWithIndex materializes the
    sorted relation once).
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    totals = postings.groupBy("term").agg(
        F.sum("freq").cast("long").alias("total_freq")
    )
    ordered = totals.orderBy(F.desc("total_freq"), F.asc("term"))
    schema = StructType(
        list(ordered.schema.fields) + [StructField("term_id", IntegerType(), False)]
    )
    indexed = ordered.rdd.zipWithIndex().map(
        lambda pair: (*pair[0], pair[1] + 1)
    )
    return postings.sparkSession.createDataFrame(indexed, schema)


def metadata_inversion(
    frames: DataFrame, fields: Sequence[str], unit: str = "frame"
) -> DataFrame:
    """(field, value) -> sorted id list + count, per metadata field."""
    outs = []
    for f in fields:
        if unit == "document":
            ids = frames.select(F.col(f).cast("string").alias("value"),
                                "doc_id").dropDuplicates()
            idc = F.col("doc_id")
        else:
            ids = frames.select(
                F.col(f).cast("string").alias("value"), "doc_id", "frame_seq"
            )
            idc = F.concat_ws(":", "doc_id", "frame_seq")
        outs.append(
            ids.groupBy("value")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sort_array(F.collect_list(idc)).alias("ids"),
            )
            .select(F.lit(f).alias("field"), "value", "n", "ids")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def filter_range(
    df: DataFrame,
    start: Optional[int] = None,
    end: Optional[int] = None,
    limit: Optional[int] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyset pagination scan: ``id > start AND id <= end``, ordered by
    id, optional limit — the reference's open-interval resume-key scan
    (deep-paging-safe: the predicate pushes into the parquet scan, no
    OFFSET)."""
    out = df
    if start is not None:
        out = out.where(F.col(id_col) > start)
    if end is not None:
        out = out.where(F.col(id_col) <= end)
    out = out.orderBy(F.asc(id_col))
    return out.limit(limit) if limit is not None else out


_OPS = {
    "=": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(list(v)),
}


def attribute_filter(
    frames: DataFrame,
    attributes: DataFrame,
    conditions: Dict[str, Dict[str, object]],
) -> DataFrame:
    """Restrict frames by frame-level attribute annotations.

    ``attributes`` is the side relation (doc_id, frame_seq, type,
    value); ``conditions`` is {type: {op: value}}.  Conjunction across
    types = repeated semi-joins (the reference INTERSECTs per-type id
    sets, sqlite.py:1547-1549) — each semi-join is a broadcast when the
    qualifying id set is small."""
    out = frames
    for typ, conds in conditions.items():
        q = attributes.where(F.col("type") == typ)
        for op, val in conds.items():
            if op not in _OPS:
                raise ValueError(f"Unsupported attribute operator {op!r}")
            q = q.where(_OPS[op](F.col("value"), val))
        out = out.join(
            q.select("doc_id", "frame_seq").dropDuplicates(),
            ["doc_id", "frame_seq"],
            "left_semi",
        )
    return out
