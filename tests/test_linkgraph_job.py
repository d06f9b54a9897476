"""End-to-end link-graph pipeline job (jobs/linkgraph_job.py): one
subprocess run over a small synthetic webtext corpus with every
optional stage enabled, asserting artifact integrity (rank mass sums
to 1, degree/edge consistency, anchors bounded by the cap)."""
import json
import os
import subprocess
import sys

import pytest


def test_linkgraph_job_end_to_end(tmp_path, spark):
    from pyspark.sql import functions as F

    from caterpillar_spark.sources.webtext import synthetic_webtext

    from pyspark.sql import functions as FF

    crawl = str(tmp_path / "web.parquet")
    robots = str(tmp_path / "robots.parquet")
    out = str(tmp_path / "graph")
    web = synthetic_webtext(spark, n_docs=250, seed=21)
    web.write.parquet(crawl)
    # every site disallows /page/1* for everyone
    web.select(
        FF.regexp_extract("url", "://([^/]+)", 1).alias("host")
    ).distinct().select(
        "host", FF.lit("User-agent: *\nDisallow: /page/1\n").alias("robots_txt")
    ).write.parquet(robots)

    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "/root/repo/jobs/linkgraph_job.py",
            "--input", crawl, "--output", out,
            "--iterations", "4", "--hits", "--anchors",
            "--max-anchors", "3", "--cores", "4",
            "--frontier", "--robots", robots, "--agent", "testbot",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["pages"] == 250
    assert metrics["hosts"] > 0 and metrics["host_edges"] > 0
    assert metrics["links"] >= metrics["host_edges"]
    # Zipf-hot head: one of the lowest-ordinal sites tops the ranking
    assert metrics["top_hosts"][0]["host"] in {
        "site-0.example.org", "site-1.example.org", "site-2.example.org"
    }

    pr = spark.read.parquet(f"{out}/pagerank")
    assert pr.agg(F.sum("rank")).collect()[0][0] == pytest.approx(1.0, abs=1e-6)
    deg = spark.read.parquet(f"{out}/degree")
    edges = spark.read.parquet(f"{out}/edges")
    assert deg.count() == metrics["hosts"]
    assert (
        edges.agg(F.sum("n_links")).collect()[0][0]
        == deg.agg(F.sum("out_links")).collect()[0][0]
    )
    hs = spark.read.parquet(f"{out}/hits")
    assert hs.count() == metrics["hosts"]
    anchors = spark.read.parquet(f"{out}/anchors")
    assert anchors.count() == metrics["anchor_targets"]
    # cap bound: no joined field carries more than max-anchors texts
    over = anchors.where(
        F.size(F.split("anchor_text", " ")) > 3
    ).count()
    assert over == 0
    # frontier: new URLs only, robots-filtered (no /page/1* survivors),
    # counts consistent with the metrics line
    frontier = spark.read.parquet(f"{out}/frontier")
    assert frontier.count() == metrics["frontier_capped"]
    assert metrics["frontier_capped"] <= metrics["frontier_allowed"]
    assert metrics["frontier_allowed"] <= metrics["frontier_raw"]
    # hosts WITH robots rules have no /page/1* survivors; hosts without
    # rules (dangling targets) are rightly allowed through
    ruled = spark.read.parquet(robots).select("host")
    assert (
        frontier.join(ruled, "host", "inner")
        .where(F.col("url").rlike("/page/1"))
        .count()
        == 0
    )
    crawled = spark.read.parquet(crawl).select("url")
    assert frontier.join(crawled, "url", "inner").count() == 0
