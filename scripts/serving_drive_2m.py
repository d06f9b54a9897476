"""Round-5 serving-surface drive against a persisted multi-million-doc
index (the sf0.01 oracles hide full-scan pathologies — r4 protocol).

Measures p50 over N reps (1 warmup) for the operators round 5 touched:

* more_like_this — seed extraction via the doc-major forward layout
  (r4: 4.3 s postings scan at 2M docs; target well under 1 s);
* hot-term phrase ("the index", df≈2M both terms) — compressed kernel
  with doc-intersection pruning vs the raw-postings JVM join;
* significant_terms — background stats from term_stats + manifest
  (r4 shape: full postings background aggregation per call).

Usage:
  python3 scripts/serving_drive_2m.py --index /tmp/r5idx2m [--cores 16]
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
    ap.add_argument("--index", default="/tmp/r5idx2m")
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

    from caterpillar_spark.indexing.build import InvertedIndex
    from caterpillar_spark.query.analytics import search_ngram, significant_terms
    from caterpillar_spark.query.mlt import more_like_this
    from caterpillar_spark.query.phrase import search_ngram_compressed, search_ngram_index

    idx = InvertedIndex(spark, args.index)
    m = idx.manifest
    # a mid-range doc id that exists
    seed = idx.docs().select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    results = {}

    def run_mlt():
        more_like_this(idx, seed, max_terms=5, k=10, scorer="bm25_doc",
                       unit="document").collect()

    def run_mlt_wand():
        more_like_this(idx, seed, max_terms=5, k=10, engine="wand").collect()

    def run_mlt_seed_only():
        from caterpillar_spark.query.mlt import mlt_seed_terms

        mlt_seed_terms(idx, seed, max_terms=5)

    def run_phrase_pruned():
        search_ngram_index(idx, ["the", "index"]).count()

    def run_phrase_unpruned():
        search_ngram_compressed(
            idx.position_lists(), ["the", "index"],
            num_buckets=m.get("num_buckets"), block_bits=m.get("block_bits"),
        ).count()

    def run_phrase_raw():
        search_ngram(idx.postings(), ["the", "index"]).count()

    def run_sig_terms_hot():
        significant_terms(idx, k=20, min_fg_docs=2,
                          should=["index", "data"]).collect()

    # a selective term (the realistic analytics call: "what co-selects
    # with THIS topic"): pick one with df between 0.1% and 1% of docs
    sel = (
        idx.term_stats()
        .groupBy("term").agg(F.sum("docs_occuring").alias("d"))
        .where((F.col("d") > m["n_docs"] // 1000) & (F.col("d") < m["n_docs"] // 100))
        .orderBy("term").limit(1).collect()
    )
    sel_term = sel[0]["term"] if sel else "index"

    def run_sig_terms_selective():
        significant_terms(idx, k=20, min_fg_docs=2,
                          should=[sel_term]).collect()

    # background side in isolation: persisted-stats read vs the r4
    # shape (full-postings distinct-doc aggregation)
    from caterpillar_spark.query.analytics import _background_doc_stats

    def run_bg_stats():
        bg, n_bg, used = _background_doc_stats(idx)
        assert used and n_bg
        bg.count()

    def run_bg_postings_shape():
        posts = idx.postings().select("term", "doc_id")
        posts.groupBy("term").agg(
            F.countDistinct("doc_id").alias("bg_docs")
        ).count()
        posts.select("doc_id").distinct().count()

    for name, fn in [
        ("mlt_seed_point_read", run_mlt_seed_only),
        ("more_like_this_wand", run_mlt_wand),
        ("more_like_this_bm25doc_df", run_mlt),
        ("phrase_hot_pruned", run_phrase_pruned),
        ("phrase_hot_unpruned", run_phrase_unpruned),
        ("phrase_hot_raw_jvm", run_phrase_raw),
        ("significant_terms_hot", run_sig_terms_hot),
        ("significant_terms_selective", run_sig_terms_selective),
        ("sig_background_stats_read", run_bg_stats),
        ("sig_background_postings_shape_r4", run_bg_postings_shape),
    ]:
        med, times = p50(fn, reps=args.reps)
        results[name] = {"p50": round(med, 3), "times": [round(t, 3) for t in times]}
        print(json.dumps({"op": name, **results[name]}), flush=True)

    print(json.dumps({"summary": results, "n_docs": m.get("n_docs"),
                      "cores": args.cores}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
