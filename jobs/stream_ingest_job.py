#!/usr/bin/env python3
"""End-to-end streaming ingest: landing directory -> streaming
first-seen dedup -> transactional incremental index appends -> query.

The full streaming path the engine ships (r3 verdict #7: the pieces
existed but only pytest drove them; this job wires them end-to-end):

1. ``readStream`` tails a webtext landing directory (input_hint shape);
2. :func:`caterpillar_spark.streaming.stateful.first_seen` drops
   content duplicates ACROSS micro-batches (applyInPandasWithState on a
   text fingerprint, TTL-bounded state);
3. ``foreachBatch`` folds each micro-batch into the persisted index via
   :func:`caterpillar_spark.streaming.incremental.append_batch` — one
   manifest revision per batch, batch-id ledger + docs ledger as the
   two idempotence guards;
4. after the stream drains, a BM25 query runs against the index.

Crash semantics (exercised by scripts/stream_chaos_test.py):
``--kill-after-batches N`` hard-kills the process right AFTER the Nth
batch's index append but BEFORE its streaming checkpoint commit — the
worst-case window.  On restart Structured Streaming replays that batch;
``append_batch`` sees its batch_id already in the manifest ledger and
skips it, so nothing is double-counted.

Usage:
  spark-submit --py-files dist/caterpillar_spark.zip \
      jobs/stream_ingest_job.py --input DIR --index DIR \
      --checkpoint DIR [--cpus N] [--max-files-per-trigger N] \
      [--kill-after-batches N] [--query "spark table"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--block-bits", type=int, default=4)
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument("--kill-after-batches", type=int, default=None)
    # TTL bounds the dedup state store on a CONTINUOUS stream; in this
    # job's drain mode (availableNow) processing-time timeouts would
    # keep scheduling no-data micro-batches and the query would never
    # terminate — default off, enable for long-running deployments.
    ap.add_argument("--ttl-minutes", type=int, default=0)
    ap.add_argument("--query", default="spark table")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("caterpillar-spark-stream-ingest")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        # timeout checks piggyback on data batches; without this the
        # stateful operator's pending timeouts spin empty micro-batches
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.framing import build_frames
    from caterpillar_spark.sources.webtext import WEBTEXT_SCHEMA, ingest_webtext
    from caterpillar_spark.streaming.incremental import append_batch
    from caterpillar_spark.streaming.stateful import first_seen

    stream = (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.input)
    )
    docs = ingest_webtext(stream).withColumn("fp", F.md5("text"))
    deduped = first_seen(docs, "fp", ttl_minutes=args.ttl_minutes or None)

    t0 = time.time()
    processed = {"batches": 0, "docs": 0}

    def process(batch_df, batch_id: int) -> None:
        # persist + full count FIRST: the upstream stateful operator
        # (first_seen) must commit every state-store partition exactly
        # once per batch — Spark validates this
        # (STATE_STORE_COMMIT_VALIDATION_FAILED) — so a replayed batch
        # that append_batch's ledger skips, or an empty batch, still
        # needs one complete pass; the persist keeps later actions from
        # re-executing the stateful op.
        batch_df.persist()
        try:
            if batch_df.count() == 0:
                return
            frames = build_frames(
                batch_df.drop("fp", "url", "warc_ts"), metadata_cols=["lang"]
            )
            append_batch(
                frames,
                args.index,
                num_buckets=args.num_buckets,
                block_bits=args.block_bits,
                batch_id=batch_id,
            )
            processed["batches"] += 1
            if (
                args.kill_after_batches is not None
                and processed["batches"] >= args.kill_after_batches
            ):
                # simulate a crash in the worst window: the index append
                # is on disk, the streaming checkpoint for this batch is
                # NOT — the batch WILL replay on restart and the
                # manifest ledger must skip it
                print(json.dumps({"killed_after_batch": batch_id}), flush=True)
                os._exit(137)
        finally:
            batch_df.unpersist()

    query = (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    from caterpillar_spark.indexing.build import InvertedIndex
    from caterpillar_spark.query.wand import wand_topk

    idx = InvertedIndex(spark, args.index)
    manifest = idx.manifest
    elapsed = time.time() - t0
    terms = args.query.split()
    top = wand_topk(idx.compressed(), terms, k=10).collect()
    out = {
        "n_docs": manifest["n_docs"],
        "revision": manifest["revision"],
        "batches_in_ledger": len(manifest.get("batches", {})),
        "stream_elapsed_s": round(elapsed, 3),
        "docs_per_sec": round(manifest["n_docs"] / elapsed, 2) if elapsed else None,
        "query_terms": terms,
        "query_top1": [top[0]["doc_id"], round(top[0]["score"], 4)] if top else None,
        "query_rows": len(top),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
