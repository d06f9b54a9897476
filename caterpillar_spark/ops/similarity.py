"""Embedding similarity search: brute-force cosine top-k and
random-hyperplane LSH ANN.

The embedding column is ``array<float>``.  Dot products run JVM-side
via ``zip_with`` + ``aggregate`` higher-order functions — vectorized in
whole-stage codegen, no Python.  Brute force is the exactness baseline;
the LSH path buckets vectors by hyperplane sign bits so query-time work
is one bucket scan instead of the full table (the 100 TB path; bucket
key is shuffle/partition-prunable).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from caterpillar_spark.ops.dedup import md5_long


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Executes as a narrow scan + TakeOrderedAndProject (per-partition
    top-k, single merge) — the brute-force baseline.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(v, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Pairs with cosine >= threshold.

    With ``candidates`` (the scale path — feed it
    :func:`embedding_lsh_candidates` output) each candidate pair is
    verified by two equi-joins on the id columns: cost is linear in
    |candidates|, never a cross product.  Without candidates this is
    the brute-force all-pairs baseline — test scale only.
    """
    v = F.col(vec_col).cast("array<double>")
    norm = embeddings.select(
        F.col(id_col),
        v.alias("v"),
        _norm(v).alias("n"),
    )
    if candidates is not None:
        a = norm.select(
            F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
        )
        b = norm.select(
            F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
        return (
            candidates.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(
                    _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    a = norm.alias("a")
    b = norm.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def hyperplane_weights(num_planes: int, dim: int) -> List[List[float]]:
    """Deterministic ±1 hyperplanes derived from md5 bits (public
    random-hyperplane LSH construction, Charikar 2002)."""
    import hashlib

    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        planes.append(row)
    return planes


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket = sign-bit string over
    ``num_planes`` deterministic hyperplanes."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplane_weights(num_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(num_planes):
        w = F.array(*[F.lit(x) for x in planes[p]])
        bits.append(F.when(_dot(v, w) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.withColumn("bucket", F.concat(*bits))


def embedding_lsh_candidates(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Candidate pairs for near-dup search: vectors whose hyperplane-LSH
    buckets differ by at most ``probe_hamming`` bits.

    The scale path for :func:`embedding_near_dups`: side A explodes its
    bucket's ≤1-bit-flip variants, the join is a plain equi-join on the
    bucket string — shuffle bounded by bucket sizes, never the full
    cross product.  Result: (id_a, id_b), id_a < id_b, distinct.
    """
    bucketed = hyperplane_lsh_buckets(
        embeddings, num_planes, id_col, vec_col
    ).select(id_col, "bucket")

    variants = [F.col("bucket")]
    if probe_hamming >= 1:
        for i in range(num_planes):
            pre = F.substring("bucket", 1, i)
            bit = F.substring("bucket", i + 1, 1)
            post = F.substring("bucket", i + 2, num_planes - i - 1)
            variants.append(
                F.concat(pre, F.when(bit == "1", "0").otherwise("1"), post)
            )
    probed = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.array(*variants)).alias("bucket"),
    )
    other = bucketed.select(F.col(id_col).alias("id_b"), "bucket")
    return (
        probed.join(other, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ann_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe).

    Recall/latency trade-off is standard LSH; with 8 planes and 1-bit
    probing ~9/256 of the table is scanned in expectation.
    """
    bucketed = hyperplane_lsh_buckets(embeddings, num_planes, id_col, vec_col)
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplane_weights(num_planes, dim)
    qbits = "".join(
        "1" if sum(w * x for w, x in zip(planes[p], query_vec)) >= 0 else "0"
        for p in range(num_planes)
    )
    probes = [qbits]
    if probe_hamming >= 1:
        for i in range(num_planes):
            flipped = qbits[:i] + ("0" if qbits[i] == "1" else "1") + qbits[i + 1:]
            probes.append(flipped)
    cand = bucketed.where(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        cand.select(
            F.col(id_col), F.round(cosine_col(v, q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
