"""Round-5 curation-ops drive at 2M synthetic docs (the sf0.01 oracles
hide full-scan pathologies — standing protocol).

Measures p50 over N reps (1 warmup) for the ops/sampling.py +
decontaminate additions at corpus scale:

* token_budget_sample at a 1% budget — checks the past-budget
  partition pruning claim (most partitions must be dropped before
  their window runs) vs a 100% budget full pass;
* stratified_sample — narrow filter, should track a plain scan;
* select_survivors over a synthetic 10%-dup cluster relation;
* decontaminate against a 1k-doc stand-in benchmark (broadcast side).

The corpus is generated deterministically in-session (seeded column
expressions over spark.range — no external data), matching the
documents-table shape (doc_id, text, source, n_chars).

Usage:
  python3 scripts/curation_scale_drive.py [--n 2000000] [--cores 16]
Emits one JSON line per operation plus a summary.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def p50(fn, reps=5, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return statistics.median(times), times


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.ops import (
        decontaminate,
        select_survivors,
        stratified_sample,
        token_budget_sample,
    )

    n = args.n
    # Deterministic synthetic corpus in the documents-table shape.
    # Text: ~30 words drawn from a 50k vocabulary by hashed position —
    # enough shingle diversity that decontaminate's broadcast side
    # stays benchmark-sized.
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id") * 31 + i), F.lit(50_000)),
        ),
    )
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.pmod("id", 20).cast("string")).alias(
                "source"
            ),
        )
        .withColumn("text", F.concat_ws(" ", words))
        .withColumn("n_chars", F.length("text"))
        .withColumn("n_tokens", F.lit(30).cast("long"))
        .repartition(args.cores * 2)
        .persist()
    )
    docs.count()

    out = {"n_docs": n, "cores": args.cores}

    def run(name, fn):
        med, times = p50(fn, reps=args.reps)
        out[name] = round(med, 3)
        print(json.dumps({"op": name, "p50": round(med, 3),
                          "trials": [round(t, 3) for t in times]}),
              flush=True)

    budget_1pct = int(n * 30 * 0.01)
    run(
        "token_budget_sample_1pct",
        lambda: token_budget_sample(
            docs, budget=budget_1pct, token_col="n_tokens",
            priority_col="n_chars",
        ).count(),
    )
    run(
        "token_budget_sample_100pct",
        lambda: token_budget_sample(
            docs, budget=n * 30, token_col="n_tokens",
            priority_col="n_chars",
        ).count(),
    )
    run(
        "stratified_sample",
        lambda: stratified_sample(
            docs, {"src1": 1.0, "src2": 0.5}, default_rate=0.05, seed=7
        ).count(),
    )
    run("plain_scan_count", lambda: docs.where(F.col("n_chars") > 0).count())

    # synthetic clusters: 10% of docs pair up with doc_id-1
    clusters = docs.select("doc_id").where(
        F.pmod("doc_id", F.lit(10)) < 2
    ).withColumn(
        "cluster_id", (F.col("doc_id") - F.pmod("doc_id", F.lit(10))).cast("long")
    )
    run(
        "select_survivors",
        lambda: select_survivors(
            docs, clusters, quality_col="n_chars"
        ).count(),
    )

    bench = docs.where(F.col("doc_id") < 1000).select("text")
    run(
        "decontaminate_4gram",
        lambda: decontaminate(docs, bench, shingle_n=4).where(
            "is_contaminated"
        ).count(),
    )

    print(json.dumps({"summary": out}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
