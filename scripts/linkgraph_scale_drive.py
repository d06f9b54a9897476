"""Round-5 link-graph drive at 2M synthetic pages (standing protocol:
the sf0.01 oracles hide full-scan pathologies, so every serving
addition gets a corpus-scale measurement).

Measures p50 over N reps for:

* extract_links — the regexp_extract_all + explode pass over 2M HTML
  pages (~5 anchors each, 3 resolvable): should track a narrow column
  scan, zero shuffles;
* host_link_edges — one host-pair-keyed partial aggregation over ~6M
  resolved links;
* host_degree — two host-keyed aggs + a full-outer join over the edge
  list (~50k hosts);
* pagerank_5it — five power iterations end-to-end (per-iteration: one
  dst-keyed shuffle + one O(1) dangling scalar + localCheckpoint).

The corpus is generated deterministically in-session with seeded
column expressions over spark.range (no external data, no Python row
path): each page carries three absolute cross-host anchors (one
Zipf-ish hot-host boost layer), one site-relative anchor (host
self-loop) and one mailto: (dropped), embedded in filler text.

Usage:
  python3 scripts/linkgraph_scale_drive.py [--n 2000000] [--cores 16]
Emits one JSON line per operation plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def p50(fn, reps=3, warmup=1):
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hosts", type=int, default=50_000)
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
        extract_links,
        host_degree,
        host_link_edges,
        pagerank,
    )

    H = args.hosts

    def hostcol(hid):
        return F.concat(F.lit("h"), hid.cast("string"), F.lit(".example.org"))

    base = spark.range(args.n).withColumnRenamed("id", "doc_id")
    src_hid = F.col("doc_id") % H
    # three cross-host targets; every 5th page's first target collapses
    # onto a 97-host hot head (Zipf-ish inlink skew)
    t1 = F.when(F.col("doc_id") % 5 == 0, F.col("doc_id") % 97).otherwise(
        (F.col("doc_id") * 31 + 7) % H
    )
    t2 = (F.col("doc_id") * 17 + 3) % H
    t3 = (F.col("doc_id") * 13 + 11) % H

    def anchor(hid):
        return F.concat(
            F.lit('<a href="https://'), hostcol(hid),
            F.lit("/p/"), (F.col("doc_id") % 1000).cast("string"),
            F.lit('">x</a> filler words between links '),
        )

    html = F.concat(
        F.lit("<html><body><p>lorem ipsum crawl text "),
        anchor(t1), anchor(t2), anchor(t3),
        F.lit('<a href="/nav/home">nav</a> '),
        F.lit('<a href="mailto:a@b.c">m</a>'),
        F.lit("</p></body></html>"),
    ).cast("binary")
    url = F.concat(
        F.lit("https://"), hostcol(src_hid),
        F.lit("/p/"), (F.col("doc_id") % 1000).cast("string"),
    )
    pages = base.select(url.alias("url"), html.alias("html")).persist()
    n = pages.count()

    results = {}

    def drive(name, fn, reps=None):
        med, times = p50(fn, reps=reps or args.reps)
        results[name] = round(med, 3)
        print(json.dumps({
            "op": name, "p50_sec": round(med, 3),
            "times": [round(t, 3) for t in times],
            "pages_per_sec": round(n / med),
        }), flush=True)

    drive("extract_links", lambda: extract_links(pages).agg(
        F.count(F.lit(1))
    ).collect())

    from caterpillar_spark.ops import anchor_text_rollup, extract_anchor_texts

    drive("extract_anchor_texts", lambda: extract_anchor_texts(pages).agg(
        F.count(F.lit(1))
    ).collect())

    # the 97-host hot head concentrates inlinks: the capped rollup's
    # salted two-stage top-B is exactly the skew path under test
    anchors = extract_anchor_texts(pages).persist()
    anchors.count()
    drive("anchor_rollup_cap64", lambda: anchor_text_rollup(
        anchors, max_anchors_per_target=64
    ).agg(F.count(F.lit(1)), F.sum("n_anchors")).collect(), reps=max(1, args.reps - 1))
    anchors.unpersist()

    links = extract_links(pages)
    drive("host_link_edges", lambda: host_link_edges(links).agg(
        F.count(F.lit(1)), F.sum("n_links")
    ).collect())

    edges = host_link_edges(links).persist()
    n_edges = edges.count()

    drive("host_degree", lambda: host_degree(edges).agg(
        F.count(F.lit(1)), F.sum("in_links")
    ).collect())

    drive(
        "pagerank_5it",
        lambda: pagerank(edges, iterations=5).agg(
            F.sum("rank"), F.count(F.lit(1))
        ).collect(),
        reps=max(1, args.reps - 1),
    )

    print(json.dumps({
        "summary": results, "n_pages": n, "n_host_edges": n_edges,
        "cores": args.cores,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
