#!/usr/bin/env python3
"""Crawl link-graph pipeline — the ``spark-submit --py-files`` entry
that turns a stored-HTML crawl table into the link-side artifacts a
web corpus needs:

    outlink extraction → host edge list → host degree →
    PageRank [+ HITS] [+ per-target anchor-text rollup]

    spark-submit --py-files dist/caterpillar_spark.zip jobs/linkgraph_job.py \
        --input /path/webtext.parquet --output /path/graph \
        [--iterations 10] [--damping 0.85] [--hits] \
        [--anchors] [--max-anchors 64] [--cores N]

Input needs ``url`` (string) and ``html`` (binary or string) columns —
the webtext input-hint shape.  Writes parquet under ``--output``:

    edges/     (src_host, dst_host, n_links)
    degree/    (host, out_hosts, out_links, in_hosts, in_links)
    pagerank/  (host, rank)
    hits/      (host, hub, authority)        with --hits
    anchors/   (dst_url, n_anchors, anchor_text)  with --anchors

and prints ONE JSON line of stage metrics (pages, links, hosts,
edges, top hosts by rank) — the auditable record of the run.

Every stage is a library operator (ops/linkgraph.py), so the job
inherits their scale shapes: narrow extraction, host-keyed shuffles,
one shuffle per power iteration, salted star-cap on hot anchor
targets.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="crawl parquet with url + html columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--hits", action="store_true",
                    help="also compute HITS hub/authority scores")
    ap.add_argument("--anchors", action="store_true",
                    help="also roll up per-target anchor text")
    ap.add_argument("--max-anchors", type=int, default=64,
                    help="hot-page star cap for the anchor rollup")
    ap.add_argument("--frontier", action="store_true",
                    help="also emit the next crawl round's URL set "
                         "(targets not in this corpus)")
    ap.add_argument("--max-per-host", type=int, default=1000,
                    help="frontier politeness cap per host")
    ap.add_argument("--robots", default="",
                    help="parquet of (host, robots_txt) to filter the "
                         "frontier with (RFC 9309 prefix subset)")
    ap.add_argument("--agent", default="caterpillar",
                    help="crawler user-agent for robots matching")
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] for local runs; 0 = spark-submit's cluster")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    b = SparkSession.builder.appName("caterpillar-linkgraph")
    if args.cores:
        b = (
            b.master(f"local[{args.cores}]")
            .config("spark.sql.shuffle.partitions", str(args.cores * 2))
            .config(
                "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
            )
            .config("spark.ui.enabled", "false")
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.ops import (
        anchor_text_rollup,
        extract_anchor_texts,
        extract_links,
        hits,
        host_degree,
        host_link_edges,
        pagerank,
    )

    t0 = time.time()
    metrics: dict = {}
    pages = spark.read.parquet(args.input)
    metrics["pages"] = pages.count()

    links = extract_links(pages)
    edges = host_link_edges(links).persist()
    metrics["host_edges"] = edges.count()
    edges.write.mode("overwrite").parquet(f"{args.output}/edges")

    deg = host_degree(edges)
    deg.write.mode("overwrite").parquet(f"{args.output}/degree")
    metrics["hosts"] = deg.count()
    metrics["links"] = int(
        deg.agg(F.sum("out_links")).collect()[0][0] or 0
    )

    pr = pagerank(
        edges, iterations=args.iterations, damping=args.damping
    ).persist()
    pr.write.mode("overwrite").parquet(f"{args.output}/pagerank")
    metrics["top_hosts"] = [
        {"host": r.host, "rank": round(r.rank, 6)}
        for r in pr.orderBy(F.desc("rank"), F.asc("host")).limit(5).collect()
    ]
    pr.unpersist()

    if args.hits:
        hs = hits(edges, iterations=args.iterations)
        hs.write.mode("overwrite").parquet(f"{args.output}/hits")
        metrics["hits_rows"] = hs.count()

    if args.anchors:
        roll = anchor_text_rollup(
            extract_anchor_texts(pages),
            max_anchors_per_target=args.max_anchors,
        )
        roll.write.mode("overwrite").parquet(f"{args.output}/anchors")
        # count the WRITTEN parquet — recounting `roll` would re-run
        # the whole extraction + rollup lineage
        metrics["anchor_targets"] = (
            spark.read.parquet(f"{args.output}/anchors").count()
        )

    if args.frontier:
        from caterpillar_spark.ops import cap_per_host, crawl_frontier

        # robots runs BEFORE the politeness cap so disallowed URLs
        # never consume a host's frontier slots; persist the frontier
        # so the counts and the write share one extraction pass
        frontier = crawl_frontier(links, pages.select("url")).persist()
        metrics["frontier_raw"] = frontier.count()
        if args.robots:
            from caterpillar_spark.ops import parse_robots, robots_filter

            rules = parse_robots(spark.read.parquet(args.robots))
            frontier = robots_filter(frontier, rules, agent=args.agent)
            metrics["frontier_allowed"] = frontier.count()
        capped = cap_per_host(frontier, args.max_per_host)
        capped.write.mode("overwrite").parquet(f"{args.output}/frontier")
        metrics["frontier_capped"] = (
            spark.read.parquet(f"{args.output}/frontier").count()
        )
        frontier.unpersist()

    edges.unpersist()
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
