#!/usr/bin/env python3
"""End-to-end training-data curation pipeline — the ``spark-submit
--py-files`` entry that chains the corpus ops in the order a real
pretraining pipeline runs them:

    [domain blocklist] → [URL snapshot dedup] →
    quality annotate → exact dedup → near-dup (capped MinHash-LSH) +
    quality-aware survivor selection → [benchmark decontamination] →
    [line-level boilerplate removal] → [PII redaction] →
    [stratified source mixing] → [token-budget cut] →
    sequence-packing offsets

The two crawl-side stages activate when the input carries a URL
column (``--url-col``): ``--block-hosts`` drops blocklisted domains
(suffix semantics, zero corpus shuffle), and ``--ts-col`` collapses
re-crawl snapshots to the newest capture per canonical URL before any
content is read.

    spark-submit --py-files dist/caterpillar_spark.zip jobs/curate_job.py \
        --input /path/documents.parquet --output /path/curated \
        [--benchmark /path/bench.parquet] [--line-sep $'\\n'] [--pii] \
        [--rates src1=1.0,src2=0.5] [--default-rate 1.0] \
        [--token-budget N] [--seq-len 4096] [--cores N]

Writes the curated corpus (doc_id, text, n_tokens, start_offset,
chunk_id, chunk_pos + carried metadata) to ``--output`` and prints one
JSON line of per-stage survivor counts/metrics — the auditable record
of what each stage removed.

Every stage is one of the library operators (ops/), so the whole
pipeline inherits their scale shapes: no all-pairs joins, no
single-task windows, no driver-side state beyond O(numPartitions)
scalars.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet "
                    "(doc_id, text[, source, ...])")
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", default="", help="parquet of held-out "
                    "eval texts; docs sharing any 8-shingle are dropped")
    ap.add_argument("--line-sep", default="", help="enable corpus-wide "
                    "line dedup with this separator (e.g. $'\\n')")
    ap.add_argument("--line-min-repeat", type=int, default=100)
    ap.add_argument("--pii", action="store_true",
                    help="redact emails/phones/IPs")
    ap.add_argument("--rates", default="", help="source=rate[,source=rate] "
                    "deterministic mixture sampling")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--sample-seed", type=int, default=0)
    ap.add_argument("--token-budget", type=int, default=0,
                    help="greedy cut to this many tokens (0 = no cut)")
    ap.add_argument("--seq-len", type=int, default=4096)
    ap.add_argument("--minhash-bucket-cap", type=int, default=64)
    ap.add_argument("--url-col", default="", help="URL column enabling the "
                    "crawl-side stages")
    ap.add_argument("--ts-col", default="", help="capture-timestamp column: "
                    "collapse re-crawls to the newest snapshot per "
                    "canonical URL (needs --url-col)")
    ap.add_argument("--block-hosts", default="", help="comma list of "
                    "blocked domains OR a parquet path of hosts; matches "
                    "the host and all subdomains (needs --url-col)")
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import os

    builder = SparkSession.builder.appName("caterpillar-curate")
    if args.cores:
        builder = (
            builder.master(f"local[{args.cores}]")
            .config("spark.sql.shuffle.partitions", str(args.cores * 2))
            # local mode: the driver JVM hosts the executors, so it
            # needs real heap (same convention as build_index_job;
            # under spark-submit --driver-memory wins)
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "24g"),
            )
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.ops import (
        decontaminate,
        dedup_lines,
        exact_dedup,
        lsh_candidates,
        minhash_signatures,
        near_dup_clusters,
        pack_sequences,
        pii_scan,
        select_survivors,
        stratified_sample,
        token_budget_sample,
    )

    t0 = time.time()
    metrics: dict = {}
    docs = spark.read.parquet(args.input)
    metrics["input_docs"] = docs.count()
    has_source = "source" in docs.columns

    if (args.ts_col or args.block_hosts) and not args.url_col:
        print("--ts-col/--block-hosts need --url-col", file=sys.stderr)
        return 2

    # ---- stage 0a: domain blocklist (crawl-side, before any content)
    if args.block_hosts:
        from caterpillar_spark.ops import host_filter

        if args.block_hosts.endswith(".parquet") or "/" in args.block_hosts:
            bl = spark.read.parquet(args.block_hosts)
        else:
            bl = [h for h in args.block_hosts.split(",") if h]
        docs = host_filter(docs, bl, url_col=args.url_col, mode="block")
        metrics["after_host_filter"] = docs.count()

    # ---- stage 0b: URL snapshot dedup (newest capture per canonical
    # page; one hash shuffle on the canonical URL)
    if args.ts_col:
        from caterpillar_spark.ops import url_snapshot_dedup

        docs = url_snapshot_dedup(
            docs, url_col=args.url_col, ts_col=args.ts_col
        ).drop("canonical_url", "n_snapshots")
        metrics["after_url_dedup"] = docs.count()

    # ---- stage 1: annotate token counts + quality score (used as the
    # dedup survivor criterion and the budget priority)
    docs = docs.withColumn(
        "n_tokens", F.size(F.split("text", r"\s+")).cast("long")
    ).withColumn("quality", F.col("n_tokens").cast("double"))

    # ---- stage 2: exact dedup (content fingerprint, min-id survivor)
    ex = exact_dedup(docs)
    docs = docs.join(
        ex.where(~F.col("is_dup")).select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()
    metrics["after_exact_dedup"] = docs.count()

    # ---- stage 3: near-dup clusters + quality-aware survivors
    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=3)
    cands = lsh_candidates(
        sigs, num_hashes=16, bands=4,
        max_bucket_size=args.minhash_bucket_cap,
    )
    clusters = near_dup_clusters(cands)
    surv = select_survivors(docs, clusters, quality_col="quality")
    docs = docs.join(
        surv.where(~F.col("is_dup")).select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()
    metrics["after_near_dedup"] = docs.count()

    # ---- stage 4: benchmark decontamination (optional)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("text")
        flags = decontaminate(docs, bench, shingle_n=8, min_hits=1)
        docs = docs.join(
            flags.where(~F.col("is_contaminated")).select("doc_id"),
            "doc_id", "left_semi",
        ).localCheckpoint()
        metrics["after_decontaminate"] = docs.count()

    # ---- stage 5: corpus-wide line-level boilerplate removal (optional)
    if args.line_sep:
        cleaned = dedup_lines(
            docs, min_repeat=args.line_min_repeat, sep=args.line_sep
        )
        metrics["boilerplate_lines_removed"] = (
            cleaned.agg(F.sum("n_removed")).collect()[0][0] or 0
        )
        docs = (
            docs.drop("text")
            .join(cleaned.select("doc_id", "text"), "doc_id")
            .withColumn(
                "n_tokens", F.size(F.split("text", r"\s+")).cast("long")
            )
        )

    # ---- stage 6: PII redaction (optional)
    if args.pii:
        red = pii_scan(docs, redact=True)
        metrics["pii_matches"] = red.agg(F.sum("n_pii")).collect()[0][0] or 0
        docs = docs.drop("text").join(
            red.select("doc_id", "text"), "doc_id"
        )

    # ---- stage 7: deterministic mixture sampling (optional)
    if args.rates:
        if not has_source:
            print("--rates needs a source column", file=sys.stderr)
            return 2
        rates = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.rates.split(","))
        }
        docs = stratified_sample(
            docs, rates, default_rate=args.default_rate,
            seed=args.sample_seed,
        ).drop("sample_bucket")
        metrics["after_mixing"] = docs.count()

    # ---- stage 8: token-budget cut (optional)
    if args.token_budget:
        docs = token_budget_sample(
            docs, budget=args.token_budget,
            token_col="n_tokens", priority_col="quality",
        ).drop("cum_tokens")
        metrics["after_token_budget"] = docs.count()

    # ---- stage 9: packing layout + write
    layout = pack_sequences(docs, seq_len=args.seq_len,
                            token_col="n_tokens")
    out = docs.drop("quality").join(
        layout.select("doc_id", "start_offset", "chunk_id", "chunk_pos"),
        "doc_id",
    )
    out.write.mode("overwrite").parquet(args.output)

    final = spark.read.parquet(args.output)
    metrics["output_docs"] = final.count()
    metrics["output_tokens"] = final.agg(F.sum("n_tokens")).collect()[0][0]
    metrics["output_chunks"] = (
        final.agg(F.countDistinct("chunk_id")).collect()[0][0]
    )
    metrics["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
