#!/usr/bin/env python3
"""Index-build + BM25 query job — the ``spark-submit --py-files`` entry
point (north_rule ops requirement) and the unit of work for the
two-cluster-size scaling measurement.

Usage (cluster):

    scripts/make_dist.sh
    spark-submit --py-files dist/caterpillar_spark.zip \
        jobs/build_index_job.py --input /path/webtext.parquet \
        --index-path /path/index --queries "spark table,the index"

Usage (sandbox scaling evidence, see scripts/scaling_bench.py):

    python jobs/build_index_job.py --cores 8 --input /tmp/webtext \
        --index-path /tmp/idx8

Prints one JSON line: build seconds, docs/sec, per-query p50 latency.
The input is the Common-Crawl-style table (url, warc_ts, html, text,
lang) — BASELINE.json input_hint; generate one deterministically with
``--generate N``.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webtext parquet path")
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] master; 0 = use spark-submit's master")
    ap.add_argument("--generate", type=int, default=0,
                    help="first synthesize N webtext docs at --input")
    ap.add_argument("--generate-only", action="store_true",
                    help="stop after writing the synthetic corpus")
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--block-bits", type=int, default=6)
    ap.add_argument("--checkpoint-groups", type=int, default=4)
    ap.add_argument("--with-anchors", action="store_true",
                    help="extract each page's incoming anchor text from "
                         "the corpus HTML and index it as a second TEXT "
                         "field (BM25F-over-anchors at query time)")
    ap.add_argument("--with-positions", action="store_true",
                    help="also write the compressed positions layout "
                    "(phrase/ngram search over varint position streams)")
    ap.add_argument("--queries", default="the,spark table,index query data")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fresh", action="store_true",
                    help="remove any existing index at --index-path first")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import os

    builder = SparkSession.builder.appName("caterpillar-index-build")
    if args.cores:
        builder = (
            builder.master(f"local[{args.cores}]")
            # 2x cores: AQE coalesces the small ones, stragglers split
            .config("spark.sql.shuffle.partitions", str(args.cores * 2))
            .config("spark.default.parallelism", str(args.cores))
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "24g"),
            )
            # small webtext files otherwise pack into a handful of
            # splits and serialize the scan + ingest shuffle
            .config("spark.sql.files.maxPartitionBytes", "8m")
            # our shuffles are ~10MB/partition: the 64MB advisory target
            # would coalesce reduce stages below the core count
            .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        )
    for kv in os.environ.get("SPARK_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.framing import build_frames
    from caterpillar_spark.indexing.build import build_index
    from caterpillar_spark.query.wand import wand_topk
    from caterpillar_spark.sources import ingest_webtext, synthetic_webtext

    if args.generate:
        synthetic_webtext(spark, args.generate, seed=42).write.mode(
            "overwrite"
        ).parquet(args.input)
        if args.generate_only:
            print(json.dumps({"generated": args.generate, "input": args.input}))
            spark.stop()
            return 0

    if args.fresh:
        shutil.rmtree(args.index_path, ignore_errors=True)

    web = spark.read.parquet(args.input)
    n_docs = web.count()  # warms the scan; excluded from build timing

    # Warm the Python UDF workers (fork + numpy/pandas imports) so the
    # timed region measures steady-state throughput, not cold start —
    # on a long-lived cluster the workers are already resident.
    warm_par = (spark.sparkContext.defaultParallelism or 8) * 2
    spark.range(warm_par * 4, numPartitions=warm_par).mapInPandas(
        lambda it: it, "id long"
    ).count()

    t_start = time.perf_counter()
    t0 = t_start
    # Fan the docs out to every core before the analysis UDF: the text
    # payload is small enough that the parquet scan would otherwise
    # coalesce into a handful of input splits (maxPartitionBytes) and
    # strand the framing stage on a few tasks.  html is dropped by
    # ingest first so the shuffle moves only what indexing needs.
    par = spark.sparkContext.defaultParallelism
    docs = ingest_webtext(web, with_anchors=args.with_anchors).repartition(
        par * 4
    )
    text_cols = ["text", "anchor"] if args.with_anchors else ["text"]
    frames = build_frames(docs, text_cols=text_cols, metadata_cols=["lang"])
    idx = build_index(
        frames,
        args.index_path,
        num_buckets=args.num_buckets,
        block_bits=args.block_bits,
        checkpoint_groups=args.checkpoint_groups,
        with_positions=args.with_positions,
        source=args.input,
    )
    build_s = time.perf_counter() - t0

    cidx = idx.compressed()
    latencies = {}
    for q in [q.strip() for q in args.queries.split(",") if q.strip()]:
        terms = q.split()
        times = []
        wand_topk(cidx, terms, k=args.k).collect()  # warm
        for _ in range(args.reps):
            t0 = time.perf_counter()
            wand_topk(cidx, terms, k=args.k).collect()
            times.append(time.perf_counter() - t0)
        latencies[q] = round(statistics.median(times), 4)

    out = {
        "n_docs": n_docs,
        "build_seconds": round(build_s, 3),
        "docs_per_sec": round(n_docs / build_s, 2),
        "bm25_p50_sec": round(statistics.median(latencies.values()), 4),
        "query_p50": latencies,
        "manifest_revision": idx.manifest["revision"],
        "cores": args.cores or "submit-default",
    }
    # Slice and stats jobs run concurrently; each manifest entry records
    # wall time from the write-pool start, so the pool's wall is their max.
    m = idx.manifest
    writes_wall = max(
        [v["seconds"] for v in m["completed_slices"].values()]
        + [m["metrics"].get("stats_seconds", 0.0)]
    )
    out["phases"] = {
        "frames_and_constants": round(build_s - writes_wall, 3),
        "concurrent_writes_wall": round(writes_wall, 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
