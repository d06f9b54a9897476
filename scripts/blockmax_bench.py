#!/usr/bin/env python3
"""Block-max WAND pruning measurement (VERDICT r2 item #5).

The r2 block-sizing study showed bits=6 winning at 2M docs but never
showed the skip step *fire* — at sandbox scale every block of a hot
term still contains top-k candidates, so the 10^9-regime pruning claim
rested on design argument alone.  This script manufactures the regime
the claim is about and measures it:

* a synthetic 10M-doc-id corpus (deterministic: doc_id = xxhash64(i),
  the same uniform-hash spread the webtext pipeline produces), with a
  Zipf-ish term mix: one hot term (df 5M), eight mid terms (df 100k
  each), one selective term (df 640, idf ~9.6);
* web-scale block sizing (block_bits 10 and 12 -> 1k/4k doc-range
  blocks, ~1.2-4.9k hot postings per block row);
* the selective-OR-hot query whose top-k is owned by the selective
  term: once each task's heap holds k selective-doc scores, every
  block group containing only hot/mid rows has an upper bound far
  below the kth score and is skipped without decoding;
* ``prune=True`` vs ``prune=False`` (exhaustive) with the skip/scored
  accumulators from ``wand_topk(metrics=...)``, asserting the top-k is
  IDENTICAL both ways (the skip is exact, not approximate).

Expected shape (recorded in BASELINE.md): high skip rates for the
selective query at bits=12 (more groups per task -> more skippable),
zero skips for the hot-only query (every block of a uniform hot term
really does contain top-k candidates — pruning cannot and should not
fire; that honesty point from r2 stands, now as a measurement).

Usage: python3 scripts/blockmax_bench.py  (env: BM_N, BM_BITS="10,12",
BM_CPUS) — prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

N = int(os.environ.get("BM_N", 10_000_000))
BITS_LIST = [int(b) for b in os.environ.get("BM_BITS", "10,12").split(",")]
CPUS = int(os.environ.get("BM_CPUS", "32"))
BUCKETS = 16
K = 10
RARE_EVERY = N // 640  # df = 640, uniform over the doc-id hash space


def corpus(spark):
    ids = spark.range(N).select(
        F.col("id"), F.xxhash64(F.col("id")).alias("doc_id")
    )
    base = ids.withColumn("dl", (40 + F.pmod("id", F.lit(41))).cast("long"))
    doc_lens = base.select("doc_id", "dl")
    hot = base.where(F.col("id") % 2 == 0).select(
        F.lit("hot").alias("term"), "doc_id",
        (1 + F.pmod("id", F.lit(3))).cast("long").alias("freq"),
    )
    mids = [
        base.where(F.pmod("id", F.lit(100)) == m).select(
            F.lit(f"mid{m}").alias("term"), "doc_id",
            (1 + F.pmod("id", F.lit(4))).cast("long").alias("freq"),
        )
        for m in range(8)
    ]
    rare = base.where(F.pmod("id", F.lit(RARE_EVERY)) == 0).select(
        F.lit("rare").alias("term"), "doc_id",
        (2 + F.pmod("id", F.lit(3))).cast("long").alias("freq"),
    )
    postings = hot
    for m in mids:
        postings = postings.unionAll(m)
    postings = postings.unionAll(rare)
    return postings, doc_lens


def main():
    from caterpillar_spark.query.wand import CompressedIndex, wand_topk

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("blockmax-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    postings, doc_lens = corpus(spark)
    out = {"n_doc_ids": N, "queries": {}}
    for bits in BITS_LIST:
        t0 = time.perf_counter()
        cidx = CompressedIndex.build(
            postings, num_buckets=BUCKETS, block_bits=bits, doc_lens=doc_lens
        )
        cidx.lists = cidx.lists.persist()
        n_rows = cidx.lists.count()
        build_s = round(time.perf_counter() - t0, 2)
        res = {"build_s": build_s, "list_rows": n_rows, "n_docs": cidx.n_docs}
        for qname, terms in (
            ("rare_or_hot", ["rare", "hot"]),
            ("mid0_or_hot", ["mid0", "hot"]),
            ("hot_only", ["hot"]),
        ):
            entry = {}
            rows_by_mode = {}
            for prune in (True, False):
                # warm + 3 timed reps; metrics from the last rep
                wand_topk(cidx, terms, k=K, prune=prune).count()
                times = []
                for _ in range(3):
                    metrics = {}
                    t0 = time.perf_counter()
                    rows = wand_topk(
                        cidx, terms, k=K, prune=prune, metrics=metrics
                    ).collect()
                    times.append(time.perf_counter() - t0)
                rows_by_mode[prune] = [
                    (r["doc_id"], round(r["score"], 9)) for r in rows
                ]
                mode = "pruned" if prune else "exhaustive"
                skipped = metrics["blocks_skipped"].value
                scored = metrics["blocks_scored"].value
                entry[mode] = {
                    "median_s": round(sorted(times)[1], 3),
                    "blocks_skipped": skipped,
                    "blocks_scored": scored,
                    "skip_rate": round(skipped / max(skipped + scored, 1), 4),
                }
            assert rows_by_mode[True] == rows_by_mode[False], (
                f"pruning changed the top-k for {qname}!"
            )
            entry["exact"] = True
            res[qname] = entry
        out["queries"][f"bits={bits}"] = res
        cidx.lists.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
