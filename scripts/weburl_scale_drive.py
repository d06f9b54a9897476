"""Round-5 weburl-ops drive at 2M synthetic crawl rows (standing
protocol: the sf0.01 oracles hide full-scan pathologies, so every
serving/curation addition gets a corpus-scale measurement).

Measures p50 over N reps (1 warmup) for:

* canonical_url alone — the narrow regexp map (should track a plain
  column scan; zero shuffles);
* url_snapshot_dedup — ONE hash shuffle on canonical_url; per-page
  groups are bounded (~4 snapshots/page here), so no hot key;
* host_stats — one host-keyed partial aggregation (hosts are Zipf-ish:
  host id = doc_id % 50k skews the low ids via a second mod layer).

The corpus is generated deterministically in-session (seeded column
expressions over spark.range — no external data), matching the
input-hint crawl shape (url, warc_ts, lang) plus n_chars.

Usage:
  python3 scripts/weburl_scale_drive.py [--n 2000000] [--cores 16]
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

    from caterpillar_spark.ops import canonical_url, host_stats, url_snapshot_dedup

    # ~500k canonical pages over ~50k hosts, ~4 raw snapshots per page
    # spread across the five canonicalizer variants.  Low host ids get
    # a mild Zipf-ish boost (doc_id % 7 == 0 collapses to host % 97).
    base = spark.range(args.n).withColumnRenamed("id", "doc_id")
    hid = F.when(
        F.col("doc_id") % 7 == 0, (F.col("doc_id") % 97).cast("string")
    ).otherwise((F.col("doc_id") % 50_000).cast("string"))
    host = F.concat(F.lit("h"), hid, F.lit(".example.org"))
    path = F.concat(F.lit("/docs/"), (F.col("doc_id") % 500_000).cast("string"))
    v = F.col("doc_id") % 5
    url = (
        F.when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(host), path))
        .when(v == 2, F.concat(F.lit("https://"), host, path, F.lit("/")))
        .when(v == 3, F.concat(F.lit("https://"), host, F.lit(":443"), path))
        .when(
            v == 4,
            F.concat(
                F.lit("https://"), host, path,
                F.lit("?utm_source=feed&ref="),
                (F.col("doc_id") % 3).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("https://"), host, path))
    )
    crawl = base.select(
        "doc_id",
        url.alias("url"),
        F.col("doc_id").alias("warc_ts"),
        F.when(F.col("doc_id") % 10 == 0, "de").otherwise("en").alias("lang"),
        (F.col("doc_id") % 1000 + 50).alias("n_chars"),
    ).persist()
    n = crawl.count()

    results = {}

    def drive(name, fn):
        med, times = p50(fn, reps=args.reps)
        results[name] = round(med, 3)
        print(json.dumps({
            "op": name, "p50_sec": round(med, 3),
            "times": [round(t, 3) for t in times],
            "rows_per_sec": round(n / med),
        }))

    drive("canonical_url", lambda: crawl.select(
        canonical_url(F.col("url")).alias("c")
    ).agg(F.count("c")).collect())

    drive("url_snapshot_dedup", lambda: url_snapshot_dedup(
        crawl, ts_col="warc_ts"
    ).agg(F.count(F.lit(1)), F.sum("n_snapshots")).collect())

    drive("host_stats", lambda: host_stats(
        crawl, lang_col="lang", size_col="n_chars"
    ).agg(F.count(F.lit(1)), F.sum("n_docs")).collect())

    from caterpillar_spark.ops import host_filter

    blocked = [f"h{i}.example.org" for i in range(0, 2000, 2)]
    drive("host_filter_1k", lambda: host_filter(
        crawl, blocked
    ).agg(F.count(F.lit(1))).collect())

    bl_df = spark.createDataFrame([(h,) for h in blocked], ["host"])
    drive("host_filter_1k_df", lambda: host_filter(
        crawl, bl_df
    ).agg(F.count(F.lit(1))).collect())

    drive("host_filter_8", lambda: host_filter(
        crawl, blocked[:8]
    ).agg(F.count(F.lit(1))).collect())

    print(json.dumps({"summary": results, "n_rows": n, "cores": args.cores}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
