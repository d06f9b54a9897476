#!/usr/bin/env python3
"""BM25 top-k query job over a persisted index — the serving-side
``spark-submit --py-files`` entry point (pairs with build_index_job).

    spark-submit --py-files dist/caterpillar_spark.zip jobs/query_job.py \
        --index-path /path/index --query "spark table" --k 10 \
        [--mode or|and] [--exclude "bad term"] [--engine wand|dataframe]

Prints one JSON line per query with ranked (doc_id, score) plus timing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--query", action="append", default=[],
                    help="space-separated terms; repeatable")
    ap.add_argument("--suggest", default="",
                    help="did-you-mean: print the d<=2 fuzzy ball of this "
                    "term ranked by corpus frequency, then exit")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and"], default="or")
    ap.add_argument("--exclude", default="",
                    help="space-separated must_not terms")
    ap.add_argument(
        "--engine", choices=["wand", "dataframe", "parser"], default="wand",
        help="parser = Lucene-lite query-string syntax "
        '(+must -not term~d pre* "phrase" field:op value)',
    )
    ap.add_argument("--batch", action="store_true",
                    help="with --engine parser: run ALL --query strings "
                    "in one Spark job (execute_many; phrase/metadata "
                    "clauses not supported in batch)")
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("caterpillar-query")
    if args.cores:
        builder = builder.master(f"local[{args.cores}]").config(
            "spark.sql.shuffle.partitions", str(args.cores)
        )
    spark = builder.config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from caterpillar_spark.indexing.build import InvertedIndex
    from caterpillar_spark.query import search
    from caterpillar_spark.query.wand import wand_topk

    idx = InvertedIndex(spark, args.index_path)

    if args.suggest:
        from caterpillar_spark.query.expand import suggest

        t0 = time.perf_counter()
        rows = suggest(idx, args.suggest.lower(), max_edits=2, k=5).collect()
        print(json.dumps({
            "suggest": args.suggest,
            "seconds": round(time.perf_counter() - t0, 4),
            "candidates": [
                {"term": r["term"], "distance": r["distance"],
                 "weight": r["weight"]}
                for r in rows
            ],
        }))
        spark.stop()
        return 0
    if not args.query:
        print(json.dumps({"error": "need --query or --suggest"}))
        spark.stop()
        return 2

    must_not = args.exclude.split() if args.exclude else []
    cidx = idx.compressed() if args.engine == "wand" else None

    if args.batch:
        if args.engine != "parser":
            print(json.dumps({"error": "--batch requires --engine parser"}))
            spark.stop()
            return 2
        from caterpillar_spark.query.parser import execute_many

        qmap = {f"q{i}": q for i, q in enumerate(args.query)}
        t0 = time.perf_counter()
        rows = execute_many(idx, qmap, k=args.k, scorer="bm25").collect()
        dt = time.perf_counter() - t0
        by: dict = {qid: [] for qid in qmap}
        for r in rows:
            by[r["query_id"]].append(
                {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
            )
        print(json.dumps({
            "engine": "parser-batch",
            "k": args.k,
            "seconds": round(dt, 4),
            "seconds_per_query": round(dt / len(qmap), 4),
            "results": [
                {"query": qmap[qid], "hits": by[qid]} for qid in qmap
            ],
        }))
        spark.stop()
        return 0

    for q in args.query:
        terms = q.split()
        t0 = time.perf_counter()
        if args.engine == "wand":
            rows = wand_topk(
                cidx, terms, k=args.k, mode=args.mode, must_not=must_not
            ).collect()
        elif args.engine == "parser":
            from caterpillar_spark.query.parser import execute_query

            rows = execute_query(idx, q, k=args.k, scorer="bm25").collect()
        else:
            kw = {"must" if args.mode == "and" else "should": terms}
            rows = search(
                idx, k=args.k, unit="document", scorer="bm25",
                must_not=must_not, **kw,
            ).collect()
        print(json.dumps({
            "query": q,
            "engine": args.engine,
            "k": args.k,
            "seconds": round(time.perf_counter() - t0, 4),
            "hits": [
                {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
                for r in rows
            ],
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
