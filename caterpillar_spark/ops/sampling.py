"""Corpus-curation sampling / selection operators.

The steps a training-data pipeline runs AFTER dedup and quality
scoring: pick which duplicate survives (quality-aware, not just
min-id), cut the corpus to a token budget (highest-value documents
first), and mix sources to target proportions (deterministic, so two
runs — or a backfill and an increment — select the same rows).

Everything here is JVM-side column algebra: one shuffle per operator
(a groupBy or a range partition), no Python row path, no driver
materialization beyond O(numPartitions) scalars.  All three are
oracle-checked against DuckDB SQL on the same parquet
(``__spark_entry__.py``).

Scale notes (the 100 TB question for each):

* :func:`select_survivors` — one partial-agg shuffle keyed by
  cluster_id + one join back on the same key (AQE plans the join
  off the agg's partitioning); cluster count ~ doc count, no skew
  beyond the largest dup cluster (bounded upstream by the capped-LSH
  candidate generation, see ops/dedup.py:240).
* :func:`token_budget_sample` — the global greedy order is computed
  with the same range-partition + per-partition-count prefix-sum
  construction as :func:`caterpillar_spark.query.vectors.vocabulary`
  (no SinglePartition window — the naive ``SUM() OVER (ORDER BY …)``
  collapses 10^9 rows onto one task).  Partitions entirely past the
  budget are dropped *before* their window runs.
* :func:`stratified_sample` — stateless per-row hash test, a narrow
  map; no shuffle at all.
"""
from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caterpillar_spark.ops.dedup import md5_long

__all__ = [
    "select_survivors",
    "token_budget_sample",
    "stratified_sample",
    "pack_sequences",
]


def select_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor selection over duplicate clusters.

    ``clusters`` is the (doc_id, cluster_id) relation from
    :func:`caterpillar_spark.ops.dedup.near_dup_clusters` (or exact
    dedup groups).  Instead of the min-id convention, the survivor of
    each cluster is the member with the HIGHEST ``quality_col`` (ties
    broken by min id — deterministic under any partitioning).
    Documents absent from ``clusters`` are singletons: their own
    survivor.

    Returns one row per document in ``docs``:
    ``(id, cluster_id, survivor_id, cluster_size, is_dup)``.

    Shape: left join onto clusters (doc_id-keyed), one
    groupBy(cluster_id) with a struct-max partial aggregation, one
    equi-join back on cluster_id.  The struct max ``(quality, -id)``
    resolves argmax-with-tiebreak in a single agg — no window, no
    second shuffle key.
    """
    member = docs.select(
        F.col(id_col), F.col(quality_col).alias("_q")
    ).join(
        clusters.select(
            F.col(id_col), F.col("cluster_id").alias("_cl")
        ),
        id_col,
        "left",
    ).withColumn("cluster_id", F.coalesce("_cl", F.col(id_col)))
    best = member.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("_q").alias("q"), (-F.col(id_col)).alias("nid")
            )
        ).alias("_b"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    ).select(
        "cluster_id",
        (-F.col("_b.nid")).cast("long").alias("survivor_id"),
        "cluster_size",
    )
    return member.join(best, "cluster_id").select(
        id_col,
        "cluster_id",
        "survivor_id",
        "cluster_size",
        (F.col(id_col) != F.col("survivor_id")).alias("is_dup"),
    )


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    priority_col: Optional[str] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget selection: take documents in priority order
    until the cumulative token count exceeds ``budget``.

    The canonical "cut 300B tokens for this run" step: order by
    (``priority_col`` desc, id asc) — quality score, dedup weight,
    whatever the pipeline ranks by; id-only order when ``priority_col``
    is None — and keep the maximal prefix whose running token total
    stays ``<= budget``.  Returns the selected rows with their
    ``cum_tokens`` (the running total INCLUDING the row), so the cut is
    auditable.

    Execution (no single-task global window):

    1. ``repartitionByRange`` on the full greedy key — each partition
       owns a contiguous range of the global order;
    2. one O(numPartitions) job collects per-partition token sums; the
       driver prefix-sums them into offsets;
    3. partitions whose offset already exceeds the budget are dropped
       before any window runs (at 10^9 docs with a 1% budget, ~99% of
       the data is never window-sorted);
    4. a ``SUM() OVER`` window partitioned by ``spark_partition_id()``
       computes local running totals in parallel; the broadcast literal
       offsets make them global.

    The ranged relation is persisted for the two passes and unpersisted
    before return; the result is an eager ``localCheckpoint`` that owns
    its blocks (same lifecycle discipline as
    :func:`caterpillar_spark.query.vectors.vocabulary`).
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    order = (
        [F.col(priority_col).desc(), F.col(id_col).asc()]
        if priority_col
        else [F.col(id_col).asc()]
    )
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = (
        docs.repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in ranged.groupBy("_pid")
            .agg(F.sum(F.col(token_col)).cast("long").alias("s"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += sums[pid]
        live = [pid for pid, off in offsets.items() if off < budget]
        if not live:
            out = ranged.where(F.lit(False))
        else:
            off_expr = F.element_at(
                F.create_map(
                    *[
                        F.lit(x)
                        for pid in live
                        for x in (pid, offsets[pid])
                    ]
                ),
                F.col("_pid"),
            )
            w = (
                Window.partitionBy("_pid")
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            out = (
                ranged.where(F.col("_pid").isin(live))
                .withColumn(
                    "cum_tokens",
                    (
                        off_expr
                        + F.sum(F.col(token_col)).over(w)
                    ).cast("long"),
                )
                .where(F.col("cum_tokens") <= budget)
            )
        out = out.drop("_pid").localCheckpoint()
    finally:
        ranged.unpersist()
    return out


#: Hash-space modulus for deterministic sampling: rates are applied as
#: integer thresholds over md5-derived buckets in [0, SAMPLE_MOD).
SAMPLE_MOD = 1_000_000


def stratified_sample(
    docs: DataFrame,
    rates: Dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-source sampling to target mixture rates.

    ``rates`` maps source values to keep-fractions in [0, 1]; sources
    absent from the map use ``default_rate``.  A row is kept iff
    ``md5(seed:source:id) mod SAMPLE_MOD < rate * SAMPLE_MOD`` — a pure
    function of (seed, source, id), so the selection is reproducible
    across runs, machines, and partial backfills (the property random()
    sampling lacks), and raising a rate strictly grows the prior
    sample (nested samples share the hash).

    Stateless narrow map — no shuffle; the filter sits directly over
    the scan.  Returns the kept rows with their ``sample_bucket`` for
    auditability.
    """
    bucket = F.pmod(
        md5_long(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col(source_col),
                F.col(id_col).cast("string"),
            )
        ),
        F.lit(SAMPLE_MOD),
    ).cast("long")
    thresh = None
    for src, rate in sorted(rates.items()):
        cond = F.col(source_col) == src
        lit = F.lit(int(rate * SAMPLE_MOD))
        thresh = (
            F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
        )
    default_lit = F.lit(int(default_rate * SAMPLE_MOD))
    thresh = default_lit if thresh is None else thresh.otherwise(default_lit)
    return docs.withColumn("sample_bucket", bucket).where(
        F.col("sample_bucket") < thresh
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-packing offsets for pretraining: documents are laid out
    as one concatenated token stream in deterministic ``id_col`` order
    and sliced into fixed ``seq_len`` chunks (the standard GPT-style
    packing where documents may straddle chunk boundaries).  For each
    document this returns WHERE it lands:
    ``(id, n_tokens, start_offset, chunk_id, chunk_pos)`` — the global
    token offset of the document's first token, the training chunk
    that token falls in (``start_offset // seq_len``) and the position
    within it.  A loader can groupBy ``chunk_id`` to materialize
    training rows; the layout is a pure function of the corpus, so two
    runs (or a resumed run) pack identically.

    Execution: the global running total uses the same
    range-partition + driver prefix-sum construction as
    :func:`token_budget_sample` (and ``query.vectors.vocabulary``) —
    one O(numPartitions) scalar job, per-partition windows with
    broadcast literal offsets, no SinglePartition window at any size.
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = (
        docs.repartitionByRange(nparts, F.col(id_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in ranged.groupBy("_pid")
            .agg(F.sum(F.col(token_col)).cast("long").alias("s"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += sums[pid]
        if offsets:
            off_expr = F.element_at(
                F.create_map(
                    *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
                ),
                F.col("_pid"),
            )
        else:
            off_expr = F.lit(0)
        w = (
            Window.partitionBy("_pid")
            .orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        start = (
            off_expr
            + F.sum(F.col(token_col)).over(w)
            - F.col(token_col)
        ).cast("long")
        out = (
            ranged.withColumn("start_offset", start)
            .select(
                id_col,
                F.col(token_col).cast("long").alias("n_tokens"),
                "start_offset",
                (F.col("start_offset") / seq_len).cast("long").alias(
                    "chunk_id"
                ),
                F.pmod(F.col("start_offset"), F.lit(seq_len))
                .cast("int")
                .alias("chunk_pos"),
            )
            .localCheckpoint()
        )
    finally:
        ranged.unpersist()
    return out
