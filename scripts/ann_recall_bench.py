#!/usr/bin/env python3
"""Recall-vs-cost tables for both ANN families (r3 verdict #3).

* IVF (codebook quantizer): recall@10 vs nprobe, sampled vs trained
  codebook, on a seeded CLUSTERED corpus (8 spherical clusters,
  noise 0.35 — what real embedding corpora look like) — mean over one
  query per cluster.
* Hyperplane LSH (multi-table multi-probe): recall@10 vs num_tables on
  the same clustered corpus AND on the driver's i.i.d. embeddings
  table (the pessimal case, kept for honesty).

Prints markdown tables for BASELINE.md.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def clustered_corpus(spark, K=8, dim=16, per=50, noise=0.35, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for i in range(K * per):
        v = centers[i % K] + noise * rng.normal(size=dim)
        v /= np.linalg.norm(v)
        pts.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    queries = []
    for j in range(K):
        q = centers[j] + 0.1 * rng.normal(size=dim)
        q /= np.linalg.norm(q)
        queries.append([float(x) for x in q])
    return emb.persist(), queries


def main():
    from caterpillar_spark.ops.similarity import (
        ann_ivf_topk,
        ann_topk,
        cosine_topk,
        ivf_train_centroids,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb, queries = clustered_corpus(spark)
    emb.count()
    brutes = [
        {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
        for q in queries
    ]
    n_cent = 8
    trained = ivf_train_centroids(emb, n_centroids=n_cent, iters=10, sample_size=400)

    print("## IVF recall@10 vs nprobe (clustered corpus, 8x50 vectors, "
          "8 centroids, mean over 8 per-cluster queries)\n")
    print("| nprobe | scan fraction | sampled codebook | trained codebook (k-means) |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 3, 4):
        rs, rt = [], []
        for q, brute in zip(queries, brutes):
            s = {r["vec_id"] for r in ann_ivf_topk(
                emb, q, k=10, n_centroids=n_cent, nprobe=nprobe).collect()}
            t = {r["vec_id"] for r in ann_ivf_topk(
                emb, q, k=10, n_centroids=n_cent, nprobe=nprobe,
                centroids=trained).collect()}
            rs.append(len(s & brute) / 10)
            rt.append(len(t & brute) / 10)
        print(f"| {nprobe} | ~{nprobe}/{n_cent} | "
              f"{np.mean(rs):.3f} | {np.mean(rt):.3f} |")

    print("\n## Hyperplane-LSH recall@10 vs num_tables "
          "(8 planes, 1-bit probes)\n")
    iid = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").persist()
    iid.count()
    qvec = iid.where(F.col("vec_id") == 0).select("embedding").first()[0]
    iid_brute = {r["vec_id"] for r in cosine_topk(iid, qvec, k=10).collect()}
    print("| num_tables | clustered corpus (mean, 8 queries) | "
          "i.i.d. sf0.01 table (pessimal, 1 query) |")
    print("|---|---|---|")
    for L in (1, 2, 4, 8):
        rc = []
        for q, brute in zip(queries, brutes):
            a = {r["vec_id"] for r in ann_topk(
                emb, q, k=10, num_planes=8, num_tables=L).collect()}
            rc.append(len(a & brute) / 10)
        ai = {r["vec_id"] for r in ann_topk(
            iid, qvec, k=10, num_planes=8, num_tables=L).collect()}
        print(f"| {L} | {np.mean(rc):.3f} | {len(ai & iid_brute) / 10:.3f} |")

    spark.stop()


if __name__ == "__main__":
    main()
