"""Incremental index maintenance with Structured Streaming.

The reference is a batch engine with *transactional increments*: each
``IndexWriter.commit()`` merges staged postings/statistics into the
stored index and bumps a monotone revision tuple
(storage/sqlite.py:133-150, _sqlite_scripts.py:305-341,
_sqlite_v0_10_0_schema.py:223-251).  The Spark-native restatement is a
``readStream -> foreachBatch`` loop over the webtext table's landing
directory: every micro-batch appends both posting layouts and *partial*
statistics rows, then bumps the manifest revision — one manifest entry
per batch is the lineage.

Design decisions (documented deviations):

* **Partial statistics, merge-on-read.**  Per-batch term/field
  statistics are appended as partial rows; the query engine already
  aggregates statistics with ``groupBy(term).agg(sum(...))``
  (query/engine.py:_resolve_weights), so readers see exact merged
  numbers without a rewrite — the reference's UNION-ALL + re-sum merge
  (_sqlite_scripts.py:305-341) becomes the read path.
  :func:`compact_statistics` folds the partials back into one row per
  key (run it periodically, like the reference's flush).
* **Frozen avgdl for block-max bounds.**  ``max_score_q`` stored in a
  block is computed against the avgdl in the manifest at append time.
  WAND must score with the same avgdl its bounds were built with, so
  the manifest avgdl is frozen at the first build and only refreshed by
  a full rebuild/compaction; document frequencies and N stay live.
  (Refreshing avgdl per batch would silently invalidate older blocks'
  upper bounds — stale-upward is safe, stale-downward is not.)
* Appends are idempotent per Structured Streaming's exactly-once
  ``foreachBatch`` contract with a checkpointLocation; the manifest
  batch ledger double-checks (a replayed batch_id is skipped).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from caterpillar_spark.indexing.build import (
    InvertedIndex,
    _load_manifest,
    _save_manifest,
    doc_field_stats,
    field_statistics,
    forward_rows,
    postings_with_bucket,
    term_statistics,
)
from caterpillar_spark.framing import build_frames, frames_to_postings


def append_batch(
    frames: DataFrame,
    path: str,
    num_buckets: int = 64,
    block_bits: int = 4,
    batch_id: Optional[int] = None,
    on_existing: str = "skip",
) -> InvertedIndex:
    """Append one batch of frames to the index at ``path`` (creating it
    if absent) and bump the revision.  Safe to call directly for
    batch-mode incremental loads; ``start_incremental_index`` calls it
    from foreachBatch.

    **Append-only-new-docs contract**: appends assume never-seen
    doc_ids — re-appending an already-indexed document would duplicate
    its postings, double-count statistics, and corrupt WAND's
    conjunctive term counts.  ``on_existing`` guards it against the
    ``docs`` ledger table:

    * ``'skip'`` (default) — already-indexed doc_ids are filtered out
      of the batch (idempotent re-ingest);
    * ``'error'`` — raise ``ValueError`` listing the clashing count;
    * ``'allow'`` — skip the ledger probe entirely (caller guarantees
      novelty; for updates, ``delete_documents`` first, then append).

    The probe is one columnar scan of the single-column doc ledger with
    the (small) batch id set broadcast into the semi-join — at 10^9
    docs that is one bigint column read, amortizable by batching.

    Concurrent callers on one index path SERIALIZE on the index write
    lock (indexing/lock.py): the manifest is read inside the lock, so
    a second writer sees the first one's revision/ledger rather than
    racing it (the reference's PID-lock contract, locking.py:50-195).
    """
    if on_existing not in ("skip", "error", "allow"):
        raise ValueError(f"on_existing must be skip|error|allow, got {on_existing!r}")
    from caterpillar_spark.indexing.lock import write_lock

    with write_lock(path):
        return _append_batch_locked(
            frames, path, num_buckets, block_bits, batch_id, on_existing
        )


def _append_batch_locked(
    frames: DataFrame,
    path: str,
    num_buckets: int,
    block_bits: int,
    batch_id: Optional[int],
    on_existing: str,
) -> InvertedIndex:
    from caterpillar_spark.indexing.postinglists import build_posting_lists

    spark = frames.sparkSession
    docs_path = os.path.join(path, "docs")
    manifest = _load_manifest(path) or {
        "revision": 0,
        "num_buckets": num_buckets,
        "block_bits": block_bits,
        "checkpoint_groups": 1,
        "completed_slices": {},
        "stats_done": True,
        "metrics": {},
        "batches": {},
        # appends to a fresh path build the forward layout and the
        # doc_fields ledger too (the build_index defaults); existing
        # indexes keep their choice
        "with_forward": True,
        "fwd_buckets": num_buckets,
        "with_doc_fields": True,
    }
    manifest.setdefault("batches", {})
    if batch_id is not None and str(batch_id) in manifest["batches"]:
        return InvertedIndex(spark, path)  # replayed batch: already applied
    num_buckets = manifest["num_buckets"]

    if (
        on_existing != "allow"
        and not os.path.isdir(docs_path)
        and manifest.get("revision", 0) > 0
    ):
        # Index predates the docs ledger (built before docs/ existed):
        # silently passing the guard here would let originally-indexed
        # doc_ids be re-appended and double-counted, with later probes
        # reporting clean against a partial ledger.  Backfill the ledger
        # from the postings' distinct frames first (one full postings
        # column scan — a one-time migration cost per legacy index).
        # Deviation (documented): a frame whose tokens were ALL
        # stop-marked carries no postings, so its length is missing from
        # the backfilled dl — same deviation as delete_documents'
        # pseudo-frames; an original-build ledger has the exact dl.
        # The write is staged (docs.backfill -> _swap_dir): a crash
        # mid-backfill must not leave a partial docs/ dir that the next
        # append's isdir gate would treat as a complete ledger (r3
        # advisory).
        from caterpillar_spark.indexing.build import _swap_dir

        backfill = (
            spark.read.parquet(os.path.join(path, "postings"))
            .select("doc_id", "field", "frame_seq", "frame_tokens")
            .dropDuplicates(["doc_id", "field", "frame_seq"])
            .groupBy("doc_id")
            .agg(F.sum("frame_tokens").cast("long").alias("dl"))
        )
        tmp = docs_path + ".backfill"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        (
            backfill.repartitionByRange(
                max(spark.sparkContext.defaultParallelism // 4, 1), "doc_id"
            )
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        _swap_dir(docs_path, tmp)

    if on_existing != "allow" and os.path.isdir(docs_path):
        new_ids = frames.select("doc_id").distinct()
        dupes = (
            spark.read.parquet(docs_path)
            .select("doc_id")
            .join(F.broadcast(new_ids), "doc_id", "left_semi")
        )
        n_dup = dupes.count()
        if n_dup:
            if on_existing == "error":
                raise ValueError(
                    f"{n_dup} doc_ids in this batch are already indexed at "
                    f"{path}; delete_documents first or use on_existing='skip'"
                )
            frames = frames.join(F.broadcast(dupes), "doc_id", "left_anti")
            if frames.isEmpty():
                return InvertedIndex(spark, path)  # nothing new in batch

    t0 = time.time()
    frames.persist()
    doc_tok = frames.groupBy("doc_id").agg(
        F.sum("frame_tokens").cast("long").alias("dl")
    )
    agg = doc_tok.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tok")
    ).collect()[0]
    batch_docs, batch_tokens = int(agg["n"]), int(agg["tok"] or 0)
    if "avgdl" not in manifest:
        manifest["avgdl"] = batch_tokens / batch_docs if batch_docs else 1.0
        manifest["n_docs"] = 0
        manifest["total_tokens"] = 0

    posts = postings_with_bucket(frames_to_postings(frames), num_buckets)
    (
        posts.repartition("term_bucket")
        .sortWithinPartitions("term", "doc_id", "frame_seq")
        .write.partitionBy("term_bucket").mode("append")
        .parquet(os.path.join(path, "postings"))
    )
    (
        build_posting_lists(
            posts.drop("term_bucket"),
            num_buckets=num_buckets,
            block_bits=manifest["block_bits"],
            avgdl=manifest["avgdl"],
            doc_lens=doc_tok,
        )
        .repartition("term_bucket").sortWithinPartitions("term", "block")
        .write.partitionBy("term_bucket").mode("append")
        .parquet(os.path.join(path, "lists"))
    )
    if manifest.get("with_positions"):
        from caterpillar_spark.indexing.postinglists import build_position_lists

        (
            build_position_lists(
                posts.drop("term_bucket"),
                num_buckets=num_buckets,
                block_bits=manifest["block_bits"],
            )
            .repartition("term_bucket").sortWithinPartitions("term", "block")
            .write.partitionBy("term_bucket").mode("append")
            .parquet(os.path.join(path, "positions"))
        )
    if manifest.get("with_forward"):
        (
            forward_rows(
                posts.drop("term_bucket"),
                manifest.get("fwd_buckets", num_buckets),
            )
            .repartition("fwd_bucket")
            .sortWithinPartitions("doc_id", "field", "frame_seq", "term")
            .write.partitionBy("fwd_bucket").mode("append")
            .parquet(os.path.join(path, "forward"))
        )
    (
        term_statistics(posts.drop("term_bucket"))
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int"),
        )
        .repartition("term_bucket")
        .write.partitionBy("term_bucket").mode("append")
        .parquet(os.path.join(path, "term_stats"))
    )
    field_statistics(frames).coalesce(1).write.mode("append").parquet(
        os.path.join(path, "field_stats")
    )
    (
        doc_tok.repartitionByRange(
            max(spark.sparkContext.defaultParallelism // 4, 1), "doc_id"
        )
        .sortWithinPartitions("doc_id")
        .write.mode("append")
        .parquet(docs_path)
    )
    if manifest.get("with_doc_fields"):
        # per-(doc, field) ledger append — NOT written on legacy
        # indexes without the flag (a partial ledger would undercount
        # field statistics on the delete path)
        (
            doc_field_stats(frames)
            .repartitionByRange(
                max(spark.sparkContext.defaultParallelism // 4, 1), "doc_id"
            )
            .sortWithinPartitions("doc_id", "field")
            .write.mode("append")
            .parquet(os.path.join(path, "doc_fields"))
        )
    frames.unpersist()

    manifest["n_docs"] += batch_docs
    manifest["total_tokens"] = manifest.get("total_tokens", 0) + batch_tokens
    manifest["revision"] += 1
    key = str(batch_id) if batch_id is not None else f"rev{manifest['revision']}"
    manifest["batches"][key] = {
        "docs": batch_docs,
        "tokens": batch_tokens,
        "seconds": round(time.time() - t0, 3),
    }
    _save_manifest(path, manifest)
    return InvertedIndex(spark, path)


def start_incremental_index(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    checkpoint_path: str,
    num_buckets: int = 64,
    block_bits: int = 4,
    metadata_cols=("lang",),
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    """Tail the webtext landing directory and fold new files into the
    index, one revision per micro-batch."""
    from caterpillar_spark.sources import WEBTEXT_SCHEMA, ingest_webtext

    reader = spark.readStream.schema(WEBTEXT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        frames = build_frames(
            ingest_webtext(batch_df), metadata_cols=list(metadata_cols)
        )
        append_batch(
            frames, index_path, num_buckets=num_buckets,
            block_bits=block_bits, batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_statistics(index: InvertedIndex) -> None:
    """Fold appended partial statistics rows into one row per key (the
    reference's flush-time merge, _sqlite_scripts.py:305-341).
    Writer-locked."""
    from caterpillar_spark.indexing.lock import write_lock

    with write_lock(index.path):
        return _compact_statistics_locked(index)


def _compact_statistics_locked(index: InvertedIndex) -> None:
    import shutil

    spark = index.spark
    ts_path = os.path.join(index.path, "term_stats")
    fs_path = os.path.join(index.path, "field_stats")
    merged_ts = (
        index.term_stats()
        .groupBy("term", "field", "term_bucket")
        .agg(
            F.sum("total_occurrences").alias("total_occurrences"),
            F.sum("frames_occuring").alias("frames_occuring"),
            F.sum("docs_occuring").alias("docs_occuring"),
        )
    )
    merged_fs = (
        index.field_stats()
        .groupBy("field")
        .agg(
            F.sum("frame_count").alias("frame_count"),
            F.sum("doc_count").alias("doc_count"),
            F.sum("token_count").alias("token_count"),
            (F.sum("token_count") / F.sum("frame_count")).alias(
                "avg_frame_tokens"
            ),
        )
    )
    from caterpillar_spark.indexing.build import _swap_dir

    for df, path, part in ((merged_ts, ts_path, "term_bucket"),
                           (merged_fs, fs_path, None)):
        tmp = path + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        w = df.repartition(part).write.partitionBy(part) if part else df.coalesce(1).write
        w.mode("overwrite").parquet(tmp)
        _swap_dir(path, tmp)
