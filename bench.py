"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Headline numbers (BASELINE.json metric):

* ``index_build_docs_per_sec`` — wall time of the full build path
  (read parquet -> vectorized framing UDF -> postings explode ->
  term/field statistics shuffle aggregations, all materialized).
* ``bm25_p50_sec`` — median of repeated BM25 top-10 document queries
  through the broadcast-join retrieval path.

Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N executors)
is produced by ``scripts/scaling_bench.py`` which runs this same build
job at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("caterpillar-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_build(spark, sf_dir: str, cpus: int = 32):
    """Full index-build path, timed; returns (seconds, n_docs, index)."""
    from caterpillar_spark.framing import build_frames
    from caterpillar_spark.query import MemoryIndex

    # the sf corpus is one parquet file = one input split; spread it
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus)
    n_docs = docs.count()

    t0 = time.perf_counter()
    frames = build_frames(
        docs, text_cols=["text"], metadata_cols=["lang", "n_chars"], frame_size=2
    ).persist()
    frames.count()
    idx = MemoryIndex(frames)
    postings = idx.postings().persist()
    postings.count()
    idx_cached = MemoryIndex(frames)
    # Materialize the statistics the query path depends on.
    term_stats = idx_cached.term_stats().persist()
    term_stats.count()
    field_stats = idx_cached.field_stats().persist()
    field_stats.count()
    build_s = time.perf_counter() - t0

    class _Built:
        def __init__(self):
            self.frames = frames
            self.spark = spark

        def postings(self):
            return postings

        def term_stats(self):
            return term_stats

        def field_stats(self):
            return field_stats

        def doc_lens(self):
            from pyspark.sql import functions as F

            return frames.groupBy("doc_id").agg(
                F.sum("frame_tokens").cast("long").alias("dl")
            )

        def num_buckets(self):
            return None

    return build_s, n_docs, _Built()


def bench_query(fn, warmups: int = 1, reps: int = 5):
    for _ in range(warmups):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = _make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from caterpillar_spark.ops import (
        exact_dedup,
        lsh_candidates,
        minhash_signatures,
        quality_scores,
        token_stats,
    )
    from caterpillar_spark.query import search
    from caterpillar_spark.query.analytics import significant_bigrams

    queries: dict[str, float] = {}

    build_s, n_docs, idx = bench_build(spark, sf_dir, cpus)
    queries["index_build"] = round(build_s, 4)
    docs_per_sec = n_docs / build_s if build_s else 0.0

    def run(df):
        df.count()

    TOPK_TERMS = ["spark", "table"]

    bm25 = lambda: run(
        search(idx, k=10, unit="document", should=TOPK_TERMS, scorer="bm25")
    )
    bm25_p50 = bench_query(bm25, warmups=1, reps=7)
    queries["bm25_topk"] = round(bm25_p50, 4)

    from caterpillar_spark.query.wand import CompressedIndex, wand_topk

    t0 = time.perf_counter()
    cidx = CompressedIndex.build(idx.postings(), num_buckets=16, block_bits=4)
    cidx.lists = cidx.lists.persist()
    cidx.lists.count()
    queries["compressed_build"] = round(time.perf_counter() - t0, 4)
    queries["wand_bm25_topk"] = round(
        bench_query(
            lambda: run(wand_topk(cidx, TOPK_TERMS, k=10)), warmups=1, reps=7
        ),
        4,
    )

    # Batch multi-query amortization: 16 BM25 queries in ONE Spark job
    # through the WAND kernel (r4).  The per-query number this records
    # is the serving-latency lever: single-query p50 is dominated by
    # job-scheduling overhead, which the batch pays once.
    from caterpillar_spark.query.wand import wand_topk_many

    _POOL = [
        "spark", "table", "join", "hash", "vector", "stream", "index",
        "query", "data", "filter", "sort", "merge", "group", "count",
        "read", "write",
    ]
    many = {
        f"q{i}": [_POOL[i], _POOL[(i + 3) % len(_POOL)]]
        for i in range(16)
    }
    wand_many_s = bench_query(
        lambda: run(wand_topk_many(cidx, many, k=10)), warmups=1, reps=3
    )
    queries["wand_many16"] = round(wand_many_s, 4)

    queries["bm25_doc_topk"] = round(
        bench_query(
            lambda: run(
                search(
                    idx, k=10, unit="document", should=TOPK_TERMS,
                    scorer="bm25_doc",
                )
            ),
            reps=3,
        ),
        4,
    )
    queries["tfidf_topk"] = round(
        bench_query(
            lambda: run(
                search(idx, k=10, unit="document", should=TOPK_TERMS, scorer="tfidf")
            ),
            reps=3,
        ),
        4,
    )
    queries["boolean_must"] = round(
        bench_query(
            lambda: run(
                search(idx, k=10, unit="document", must=["spark", "join"])
            ),
            reps=3,
        ),
        4,
    )
    queries["metadata_search"] = round(
        bench_query(
            lambda: run(
                search(
                    idx, k=10, unit="document", should=["table"],
                    metadata={"lang": {"=": "en"}},
                )
            ),
            reps=3,
        ),
        4,
    )

    # the sf corpus is one small parquet file = one input split; spread
    # the corpus-ops work across cores
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        cpus
    ).persist()
    docs.count()
    queries["significant_bigrams"] = round(
        bench_query(
            lambda: run(significant_bigrams(idx.postings(), min_count=3, threshold=1.0)),
            warmups=0, reps=1,
        ),
        4,
    )
    queries["token_stats"] = round(
        bench_query(lambda: run(token_stats(docs)), warmups=0, reps=2), 4
    )
    queries["quality_scores"] = round(
        bench_query(lambda: run(quality_scores(docs)), warmups=0, reps=2), 4
    )
    queries["exact_dedup"] = round(
        bench_query(lambda: run(exact_dedup(docs)), warmups=0, reps=2), 4
    )
    queries["minhash_lsh"] = round(
        bench_query(
            lambda: run(
                lsh_candidates(
                    minhash_signatures(docs, num_hashes=16, shingle_n=3),
                    num_hashes=16,
                    bands=4,
                )
            ),
            warmups=0, reps=1,
        ),
        4,
    )

    from caterpillar_spark.ops import decontaminate

    bench_docs = docs.where(F.col("doc_id") < 10).select("text")
    queries["decontaminate"] = round(
        bench_query(
            lambda: run(decontaminate(docs, bench_docs, shingle_n=4)),
            warmups=0, reps=2,
        ),
        4,
    )

    from caterpillar_spark.ops import embedding_lsh_candidates, embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    queries["embedding_lsh_near_dups"] = round(
        bench_query(
            lambda: run(
                embedding_near_dups(
                    emb, threshold=0.3,
                    candidates=embedding_lsh_candidates(emb, num_planes=8),
                )
            ),
            warmups=0, reps=1,
        ),
        4,
    )

    # Full query-string surface (r4): required + fuzzy + prefix +
    # metadata + phrase in one parsed query
    from caterpillar_spark.query.parser import execute_query

    queries["query_string_topk"] = round(
        bench_query(
            lambda: run(
                execute_query(
                    idx, '+spark tabl~1 s* lang:en "hash join"', k=10
                )
            ),
            warmups=1, reps=3,
        ),
        4,
    )

    from caterpillar_spark.ops import ann_ivf_topk

    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    queries["ann_ivf_topk"] = round(
        bench_query(
            lambda: run(ann_ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=3)),
            warmups=0, reps=1,
        ),
        4,
    )

    # Link-graph path (r5): outlink extraction from stored HTML bytes ->
    # host edge aggregation -> 5 power iterations of weighted PageRank.
    # Generation is excluded (test-harness artifact); the timed span is
    # the whole serving path a crawl-prioritization job would run.
    from caterpillar_spark.ops import extract_links, host_link_edges, pagerank
    from caterpillar_spark.sources.webtext import synthetic_webtext

    web = synthetic_webtext(spark, n_docs=n_docs, seed=7).persist()
    web.count()
    queries["linkgraph_pagerank"] = round(
        bench_query(
            lambda: run(
                pagerank(
                    host_link_edges(extract_links(web)), iterations=5
                )
            ),
            warmups=0, reps=1,
        ),
        4,
    )
    web.unpersist()

    total = round(sum(queries.values()), 4)
    out = {
        "metric": "index-build docs/sec + BM25 top-10 p50 (caterpillar_spark)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        "index_build_docs_per_sec": round(docs_per_sec, 2),
        "bm25_p50_sec": round(bm25_p50, 4),
        "wand_many16_per_query_sec": round(wand_many_s / 16, 4),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
