"""Hot-bucket capping in the LSH candidate generators (the r3 verdict's
top item): a boilerplate family of m near-identical pages shares every
LSH bucket and would emit m²/2 candidate pairs uncapped — the one
quadratic scale-killer on crawl data.  With ``max_bucket_size=B`` the
generators emit hub × member stars instead: pair volume is linear in m,
every member stays connected, and connected components recover the full
cluster by transitivity."""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.ops.dedup import (
    lsh_candidates,
    minhash_signatures,
    near_dup_clusters,
)
from caterpillar_spark.ops.similarity import embedding_lsh_candidates

FAMILY = 10_000  # one boilerplate family, >= the verdict's 10k bar
CAP = 8


@pytest.fixture(scope="module")
def family_sigs(spark):
    """One m=10k boilerplate family (identical signatures -> one bucket
    per band) plus a handful of distinct documents."""
    boiler = spark.range(FAMILY).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "cookie policy accept all cookies privacy terms of service "
            "navigation home about contact copyright footer"
        ).alias("text"),
    )
    distinct = spark.createDataFrame(
        [
            (100_000, "completely different article about spark joins"),
            (100_001, "another unrelated page on varint codecs"),
        ],
        "doc_id long, text string",
    )
    return minhash_signatures(
        boiler.unionAll(distinct), num_hashes=16, shingle_n=3
    )


def test_lsh_cap_bounds_pairs_linear(spark, family_sigs):
    metrics = {}
    cands = lsh_candidates(
        family_sigs, num_hashes=16, bands=4, max_bucket_size=CAP,
        metrics=metrics,
    )
    n_pairs = cands.count()
    # star shape: <= m * B pairs after dedup (uncapped would be ~5e7)
    assert n_pairs <= FAMILY * CAP
    # connectivity lower bound: every family member appears in a pair
    assert n_pairs >= FAMILY - 1
    obs = metrics["bucket_cap"].get
    # the family overflows its bucket in all 4 bands; the distinct docs'
    # buckets stay under the cap
    assert obs["capped_buckets"] == 4
    assert obs["total_buckets"] >= 4


def test_lsh_cap_cluster_recall_via_transitivity(spark, family_sigs):
    """The cap samples edges but must NOT lose members: connected
    components over the star edges recover the full m-member cluster
    with the minimum doc_id as survivor (recall 1.0)."""
    cands = lsh_candidates(
        family_sigs, num_hashes=16, bands=4, max_bucket_size=CAP
    )
    clusters = near_dup_clusters(cands).collect()
    family = [r for r in clusters if r["doc_id"] < FAMILY]
    assert len(family) == FAMILY
    assert {r["cluster_id"] for r in family} == {0}


def test_lsh_cap_noop_on_diverse_corpus(spark):
    """With no bucket over the cap, the capped star join must produce
    exactly the uncapped candidate set (size-<=B buckets emit the same
    pairs either way when B >= bucket size)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=3).persist()
    try:
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in lsh_candidates(sigs, num_hashes=16, bands=4).collect()
        }
        metrics = {}
        capped = {
            (r["id_a"], r["id_b"])
            for r in lsh_candidates(
                sigs, num_hashes=16, bands=4, max_bucket_size=1_000_000,
                metrics=metrics,
            ).collect()
        }
        assert capped == uncapped
        assert metrics["bucket_cap"].get["capped_buckets"] == 0
    finally:
        sigs.unpersist()


def test_embedding_lsh_cap(spark):
    """Same construction for the hyperplane-LSH generator: identical
    embeddings share one bucket per table; the cap keeps the pair count
    linear and the cluster connected."""
    m, cap = 2_000, 4
    dim = 8
    fam = spark.range(m).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i + 1)) for i in range(dim)]).alias("embedding"),
    )
    other = spark.createDataFrame(
        [(50_000, [float(-(i + 1)) for i in range(dim)])],
        "vec_id long, embedding array<float>",
    )
    emb = fam.unionAll(other.select("vec_id", F.col("embedding").cast("array<float>")))
    metrics = {}
    cands = embedding_lsh_candidates(
        emb, num_planes=8, probe_hamming=1, num_tables=2,
        max_bucket_size=cap, metrics=metrics,
    )
    n_pairs = cands.count()
    assert n_pairs <= m * cap * 2  # per-table star bound, pre-dedup slack
    assert n_pairs >= m - 1
    for t in range(2):
        assert metrics[f"bucket_cap_t{t}"].get["capped_buckets"] >= 1
    clusters = near_dup_clusters(cands).collect()
    fam_rows = [r for r in clusters if r["doc_id"] < m]
    assert len(fam_rows) == m
    assert {r["cluster_id"] for r in fam_rows} == {0}
