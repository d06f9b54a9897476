"""Incremental link-graph maintenance with Structured Streaming.

A crawl never stops, so the link side must absorb new page batches the
same way the index does (streaming/incremental.py): each micro-batch
appends an EDGE DELTA — the batch's host-pair link counts — and
readers merge deltas on read (counts are algebraic, so
``groupBy(src, dst).sum`` over base+deltas is exact).  PageRank/HITS/
degree then run on the merged view; :func:`compact_link_edges` folds
deltas into the base periodically, exactly like the statistics
compaction.

Idempotency: each delta lands in its own ``batch_id=N`` partition via
dynamic partition overwrite, so a replayed micro-batch (Structured
Streaming's at-least-once ``foreachBatch``) overwrites its own
partition with identical content instead of double-counting.
Compaction takes the shared writer lock (indexing/lock.py) and
records the folded batch ids in a ledger file so a replay of an
already-compacted batch is dropped.

Scale notes: the per-batch delta is one host-pair aggregation of the
BATCH (small); the merge-on-read aggregation is edge-keyed (bounded by
the distinct host-pair count, not the crawl size); compaction is the
only full-edge-relation rewrite and it is one shuffle.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from caterpillar_spark.indexing.lock import write_lock
from caterpillar_spark.ops.linkgraph import extract_links, host_link_edges

__all__ = [
    "append_link_batch",
    "merged_link_edges",
    "start_link_stream",
    "compact_link_edges",
]

_LEDGER = "compacted_batches.json"


def _ledger_path(path: str) -> str:
    return os.path.join(path, _LEDGER)


def _load_ledger(path: str) -> set:
    try:
        with open(_ledger_path(path)) as fh:
            return set(json.load(fh)["batch_ids"])
    except (OSError, ValueError, KeyError):
        return set()


def append_link_batch(
    pages: DataFrame, path: str, batch_id: int
) -> None:
    """Append one micro-batch's host-pair edge delta under
    ``{path}/deltas/batch_id={batch_id}``.

    Idempotent two ways: a replayed batch overwrites its own partition
    with identical content (the extraction is deterministic), and a
    batch that compaction already folded into the base (ledger) is
    skipped entirely.
    """
    if batch_id in _load_ledger(path):
        return
    edges = host_link_edges(extract_links(pages)).withColumn(
        "batch_id", F.lit(int(batch_id))
    )
    spark = pages.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        edges.write.mode("overwrite").partitionBy("batch_id").parquet(
            os.path.join(path, "deltas")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def merged_link_edges(spark: SparkSession, path: str) -> DataFrame:
    """Exact edge relation = base (compacted) ⊕ deltas, merged on read
    (link counts are algebraic sums)."""
    parts = []
    base = os.path.join(path, "base")
    deltas = os.path.join(path, "deltas")
    if os.path.isdir(base):
        parts.append(
            spark.read.parquet(base).select("src_host", "dst_host", "n_links")
        )
    if os.path.isdir(deltas):
        parts.append(
            spark.read.parquet(deltas).select("src_host", "dst_host", "n_links")
        )
    if not parts:
        raise FileNotFoundError(f"no link edges at {path}")
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("src_host", "dst_host").agg(
        F.sum("n_links").alias("n_links")
    )


def start_link_stream(
    spark: SparkSession,
    landing_path: str,
    path: str,
    checkpoint_path: str,
    schema=None,
    trigger_once: bool = True,
):
    """readStream over a webtext landing directory → per-batch edge
    deltas.  Same contract as start_incremental_index: exactly-once
    per batch via the checkpoint + idempotent appends."""
    if schema is None:
        from caterpillar_spark.sources.webtext import WEBTEXT_SCHEMA

        schema = WEBTEXT_SCHEMA
    stream = spark.readStream.schema(schema).parquet(landing_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_link_batch(batch_df, path, batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_link_edges(spark: SparkSession, path: str) -> None:
    """Fold all deltas into the base relation (one shuffle), record
    their batch ids in the ledger, and drop the delta files.  Takes the
    shared writer lock; readers using :func:`merged_link_edges` see
    either base+deltas or the folded base — both exact."""
    import shutil

    with write_lock(path):
        deltas_dir = os.path.join(path, "deltas")
        if not os.path.isdir(deltas_dir):
            return
        deltas = spark.read.parquet(deltas_dir)
        batch_ids = sorted(
            r.batch_id for r in deltas.select("batch_id").distinct().collect()
        )
        merged = merged_link_edges(spark, path).localCheckpoint()
        base_dir = os.path.join(path, "base")
        merged.write.mode("overwrite").parquet(base_dir)
        ledger = _load_ledger(path) | set(int(b) for b in batch_ids)
        tmp = _ledger_path(path) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_ids": sorted(ledger)}, fh)
        os.replace(tmp, _ledger_path(path))
        shutil.rmtree(deltas_dir, ignore_errors=True)
