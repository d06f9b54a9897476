"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design for 100 TB corpora:

* Exact dedup is a fingerprint groupBy — one partial-aggregated shuffle
  on a 16-byte key.
* MinHash signatures are computed per document with JVM higher-order
  functions (no shuffle, no Python); LSH banding turns near-dup search
  into an equi-join on (band, band_hash) — the only shuffle is on the
  band keys, and bucket sizes bound the quadratic pair expansion.
* All hashes are md5-derived 60-bit integers, reproducible in ANSI SQL
  so the DuckDB oracles can verify the exact same signatures.

The threshold intuition: with ``num_hashes=16`` in 4 bands of 4 rows,
the LSH candidate probability is ``1-(1-j^4)^4`` — ~50% at Jaccard 0.45,
>96% at 0.75 — standard banding math (Leskovec/Rajaraman/Ullman, MMDS
ch.3, public).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from caterpillar_spark.ops.textstats import tokens_col


def md5_long(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as a bigint.

    Identical in DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash(col: Column, seed: int) -> Column:
    return md5_long(F.concat(F.lit(str(seed)), F.lit(":"), col))


#: Modulus for the MinHash universal-hash family: the Mersenne prime
#: 2^31 - 1.  Products a*x stay < 2^62, so the arithmetic neither
#: wraps in Spark (Java long) nor errors in DuckDB (which raises on
#: BIGINT overflow) — the oracle reproduces every signature exactly.
MERSENNE31 = (1 << 31) - 1


def minhash_params(num_hashes: int):
    """Deterministic (a_i, b_i) pairs for ``h_i(x) = (a_i*x + b_i) mod
    (2^31-1)`` — derived from md5 so they are reproducible anywhere."""
    import hashlib

    params = []
    for i in range(num_hashes):
        d = hashlib.md5(f"mh:{i}".encode()).hexdigest()
        a = int(d[:8], 16) % (MERSENNE31 - 1) + 1
        b = int(d[8:16], 16) % MERSENNE31
        params.append((a, b))
    return params


def shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM-side).
    Documents shorter than ``n`` tokens yield one whole-document
    shingle."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def hashed_shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as 64-bit fingerprints
    (``xxhash64`` over the token-slice array — no per-shingle string is
    ever built, which is ~20% of the whole shingling pass at 2M docs).
    Use when only shingle EQUALITY matters (decontamination, bucketing);
    :func:`shingles_col` keeps the string form for set-overlap ops that
    report the shingles themselves."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.xxhash64(F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.xxhash64(toks))
    )


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Optional[Column] = None,
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicate grouping by content fingerprint.

    Returns one row per document: (id, fingerprint, survivor_id,
    group_size, is_dup).  The survivor is the minimum id per group —
    deterministic under any partitioning.
    """
    fp = fingerprint if fingerprint is not None else F.md5(
        F.concat_ws(" ", tokens_col(text_col))
    )
    with_fp = docs.select(F.col(id_col), fp.alias("fp"))
    groups = with_fp.groupBy("fp").agg(
        F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        with_fp.join(groups, "fp")
        .select(
            id_col,
            "fp",
            "survivor_id",
            "group_size",
            (F.col(id_col) != F.col("survivor_id")).alias("is_dup"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    dedup_shingles: bool = True,
) -> DataFrame:
    """Per-document MinHash signature: columns sig_0..sig_{k-1}.

    Standard universal-hash family: one md5 base hash per shingle,
    then ``sig_i = min over shingles of (a_i*base + b_i) mod (2^31-1)``
    — k cheap integer transforms instead of k md5 digests per shingle
    (the md5 was ~the whole cost of this operator at corpus scale).
    Parameters come from :func:`minhash_params`, so the DuckDB oracle
    reproduces every value exactly.

    With ``dedup_shingles`` (default) the base hash is computed once
    per *distinct* shingle and min-aggregated back per document — web
    corpora repeat shingles heavily (boilerplate), so this trades one
    partial-aggregated shuffle for a further cut in hashing.  The
    signature values are identical either way; the False path is the
    shuffle-free narrow projection (better for tiny inputs).
    """
    params = minhash_params(num_hashes)
    base_of = lambda c: F.pmod(md5_long(c), F.lit(MERSENNE31))
    sh = shingles_col(text_col, shingle_n)
    if not dedup_shingles:
        out = docs.select(
            F.col(id_col),
            F.transform(sh, lambda s: base_of(s)).alias("_base"),
        )
        sigs = [
            F.array_min(
                F.transform(
                    F.col("_base"),
                    lambda b, p=params[i]: F.pmod(
                        b * F.lit(p[0]) + F.lit(p[1]), F.lit(MERSENNE31)
                    ),
                )
            ).alias(f"sig_{i}")
            for i in range(num_hashes)
        ]
        return out.select(F.col(id_col), *sigs)

    exploded = docs.select(F.col(id_col), F.explode(sh).alias("_shingle"))
    hashed = (
        exploded.select(F.col("_shingle"))
        .distinct()
        # separate projection so the md5 base is evaluated exactly once
        # per distinct shingle, independent of codegen CSE
        .select("_shingle", base_of(F.col("_shingle")).alias("_b"))
        .select(
            "_shingle",
            *[
                F.pmod(
                    F.col("_b") * F.lit(a) + F.lit(b), F.lit(MERSENNE31)
                ).alias(f"h_{i}")
                for i, (a, b) in enumerate(params)
            ],
        )
    )
    return (
        exploded.join(hashed, "_shingle")
        .groupBy(id_col)
        .agg(*[F.min(f"h_{i}").alias(f"sig_{i}") for i in range(num_hashes)])
    )


def lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: Optional[int] = None,
    metrics: Optional[dict] = None,
) -> DataFrame:
    """LSH banding: candidate pairs agreeing on at least one band.

    Result: (id_a, id_b) with id_a < id_b, distinct.  The join key is
    (band_index, md5-of-band-signature).

    **Hot-bucket capping** (``max_bucket_size=B`` — the 100 TB path):
    uncapped, a boilerplate family of m near-identical (but not
    byte-identical, so exact-dedup keeps them) pages lands in one
    bucket and emits m²/2 pairs — at m=10^6 that is ~5×10^11 rows from
    a single key, the quadratic scale-killer on real crawl data.  With
    the cap, each (band, bucket)'s B members with smallest
    ``md5(id)`` (deterministic under any partitioning) become the
    bucket's *hubs*, and pairs are emitted hub × member instead of
    member × member: pair volume per bucket falls from m²/2 to ≤ m·B,
    while every member stays connected to a hub, so
    :func:`near_dup_clusters` still recovers the FULL duplicate
    cluster by transitivity.  (Capping both sides — "pairs within the
    kept B only" — would disconnect the other m−B members and silently
    drop them from the cluster; the star shape is the
    recall-preserving cap.)  The only pairs lost are non-hub–non-hub
    edges *within the same bucket*, which transitivity reconstructs.

    ``metrics``: pass a dict to receive ``metrics['bucket_cap']``, a
    ``pyspark.sql.Observation`` whose ``.get`` exposes
    ``capped_buckets`` / ``total_buckets`` once the returned relation
    has been materialized (the audible skew accounting).
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws(",", *parts)).alias("bh")
            )
        )
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "b.band", "b.bh")
    if max_bucket_size is None:
        a = exploded.alias("a")
        b_ = exploded.alias("b")
        return (
            a.join(
                b_,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .distinct()
        )

    from pyspark.sql.window import Window

    # Hub ranking: one shuffle on the bucket key; the hot bucket sorts
    # m rows in one task (linear-ish), never materializes m² pairs.
    w = Window.partitionBy("band", "bh").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = exploded.withColumn("_rk", F.row_number().over(w))
    if metrics is not None:
        from pyspark.sql import Observation

        obs = Observation("lsh_bucket_cap")
        # exactly one row per bucket has _rk == 1 (total) and one has
        # _rk == B+1 iff the bucket overflowed (capped) — countable
        # without DISTINCT, which Observation disallows.
        ranked = ranked.observe(
            obs,
            F.sum(
                F.when(F.col("_rk") == max_bucket_size + 1, 1).otherwise(0)
            ).alias("capped_buckets"),
            F.sum(F.when(F.col("_rk") == 1, 1).otherwise(0)).alias(
                "total_buckets"
            ),
        )
        metrics["bucket_cap"] = obs
    hubs = ranked.where(F.col("_rk") <= max_bucket_size).select(
        F.col(id_col).alias("_hub"), "band", "bh"
    )
    return (
        exploded.join(hubs, ["band", "bh"])
        .where(F.col(id_col) != F.col("_hub"))
        .select(
            F.least(id_col, "_hub").alias("id_a"),
            F.greatest(id_col, "_hub").alias("id_b"),
        )
        .distinct()
    )


def _release_checkpoint(df: DataFrame) -> None:
    """Best-effort eager release of a ``localCheckpoint``-ed DataFrame's
    cached blocks.  Spark's ContextCleaner reclaims checkpoint blocks
    when the DataFrame is garbage-collected anyway; this explicit
    release keeps long iterative loops (CC label propagation) from
    holding every superseded round's relation in the block manager
    until a GC happens (the r3 advisory).  Touches the LogicalRDD leaf
    through py4j, so it is guarded: on any failure the GC path still
    applies."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate candidate-pair graph.

    The step a real dedup pipeline needs after candidate generation:
    pairwise matches (from :func:`lsh_candidates`,
    :func:`ngram_jaccard_pairs`, or embedding near-dups) chain into
    duplicate *clusters*, and the survivor must be chosen per cluster,
    not per pair.  Returns one row per document appearing in any pair:
    ``(doc_id, cluster_id)`` with ``cluster_id`` = the minimum doc_id
    in the component (the deterministic dedup survivor).

    Execution: iterative min-label propagation — each round is one
    shuffle (edge equi-join + min aggregation), converging in
    O(component diameter) rounds.  Near-dup components are small and
    dense (they come from shared LSH buckets), so the diameter is tiny;
    ``max_iterations`` bounds pathological chains.  Each round's label
    relation is ``localCheckpoint``-ed: caching alone does NOT truncate
    the *logical plan* — every round references the prior labels twice
    (join + union), so an iterated cached plan grows ~2^rounds leaves
    and OOMs the driver in analysis/codegen around round 8 (found by
    tests/test_ops_misc.py non-convergence test); checkpointing cuts
    the lineage so each round plans against a leaf.  On a cluster with
    executor churn, set a reliable ``spark.sparkContext
    .setCheckpointDir`` and swap ``localCheckpoint`` for ``checkpoint``
    — same shape.  For adversarial long-chain graphs swap in the
    large-star/small-star rounds of Kiveris et al. (CC in MapReduce,
    2014) — same join primitive, O(log^2 n) rounds; not needed for the
    LSH-cluster shape.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor = edges.join(
            labels, edges["v"] == labels["node"]
        ).select(edges["u"].alias("node"), "label")
        new_labels = (
            labels.union(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        _release_checkpoint(labels)  # superseded round's blocks
        labels = new_labels
        if changed == 0:
            break
    if changed:
        # Non-convergence must not pass silently: a component returned
        # split across several cluster_ids means dedup keeps extra
        # survivors.  Signal the caller (who can raise max_iterations or
        # switch to the large-star/small-star rounds cited above).
        import warnings

        warnings.warn(
            f"near_dup_clusters did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing) — components may "
            "be split across multiple cluster_ids",
            RuntimeWarning,
            stacklevel=2,
        )
    _release_checkpoint(edges)  # the result references only `labels`
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Frequency-weighted SimHash (Charikar) of the token multiset.

    Two aggregation stages, both partial-aggregated: term frequencies,
    then per-bit signed sums.  Near-dup candidates = equal halves
    (see :func:`simhash_bands`).
    """
    toks = tokens_col(text_col)
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", md5_long(F.col("term")))
    )
    per_bit = (
        tf.select(
            id_col,
            "cnt",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .groupBy(id_col, "bit")
        .agg(
            F.sum(
                F.when(
                    F.expr("shiftright(h, bit)").bitwiseAND(1) == 1,
                    F.col("cnt"),
                ).otherwise(-F.col("cnt"))
            ).alias("s")
        )
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for near-duplicate pairs.

    With ``candidates`` (the scale path — feed it
    :func:`lsh_candidates` output) each candidate pair is verified
    directly: two equi-joins bring in the per-document shingle arrays
    and the intersection is a JVM ``array_intersect`` — cost linear in
    |candidates|, no shingle self-join at all.  Without candidates
    every shingle-sharing pair is scored through a shingle-key
    self-join — exact, but pair-quadratic per hot shingle; test scale
    only.  Result: (id_a, id_b, inter, union, jaccard).
    """
    sh = shingles_col(text_col, shingle_n)
    if candidates is not None:
        sets = docs.select(F.col(id_col), sh.alias("sh"))
        a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
        b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
        inter_c = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        union_c = (
            F.size("sh_a").cast("long") + F.size("sh_b").cast("long") - inter_c
        )
        return (
            candidates.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                inter_c.alias("inter"),
                union_c.alias("union"),
                F.round(inter_c / union_c, 6).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
    exploded = docs.select(F.col(id_col), F.explode(sh).alias("shingle"))
    sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union"),
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination flags: a document is contaminated when
    it shares at least ``min_hits`` distinct word ``shingle_n``-gram
    shingles with ANY text in ``benchmark`` (the standard train/eval
    overlap guard for LLM corpora — n-gram collision against held-out
    benchmarks, n≈8-13 in published pipelines).

    Returns one row per document in ``docs``:
    ``(id, contam_hits, is_contaminated)`` where ``contam_hits`` counts
    the document's distinct shingles that appear anywhere in the
    benchmark set.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (benchmarks are MBs against TBs), so it is distinct-ed and
    **broadcast**; the corpus side is one narrow shingle explode, a
    broadcast hash join (no shuffle of corpus data), and one
    groupBy(id) partial aggregation.  A 100 TB corpus pays a single
    pass.  If the benchmark outgrows broadcast (~GBs), drop the
    explicit ``broadcast()`` hint and Spark falls back to a shuffle
    join on the shingle key — same semantics.

    Shingles are compared as 64-bit ``xxhash64`` fingerprints
    (:func:`hashed_shingles_col`) — no per-shingle string is built,
    and the broadcast side carries 8 bytes per shingle.  A hash
    collision could flag a clean document; at 64 bits the expected
    collision count against an M-shingle benchmark is ~corpus_shingles
    * M / 2^64 (zero in practice, and the failure mode is a spurious
    flag, never a missed hit on an exact overlap).
    """
    sh = hashed_shingles_col(text_col, shingle_n)
    bench_sh = benchmark.select(
        F.explode(sh).alias("shingle")
    ).distinct()
    doc_sh = docs.select(F.col(id_col), F.explode(sh).alias("shingle"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("contam_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("contam_hits", F.lit(0)).cast("long").alias(
                "contam_hits"
            ),
            (
                F.coalesce("contam_hits", F.lit(0)) >= F.lit(min_hits)
            ).alias("is_contaminated"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    min_repeat: int = 10,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide line-level boilerplate removal (the C4/RefinedWeb
    line-dedup stage): a line (``sep``-separated segment, literal
    separator) that occurs in at least ``min_repeat`` DISTINCT
    documents is boilerplate — navigation strings, cookie banners,
    footers — and is dropped from every document.

    Returns one row per input document:
    ``(id, text, n_lines, n_removed)`` where ``text`` is the cleaned
    document (kept lines re-joined with ``sep``; empty string when
    every line was boilerplate) — distinct-document counting, so a
    document repeating its own line does not make it boilerplate
    (within-doc repetition is `repetition_stats`' job).

    Scale shape: one explode (narrow) + one line-keyed two-phase
    aggregation (count distinct docs; map-side combine collapses each
    executor's duplicates), one equi-join of the line stream against
    the hot-line set, one doc-keyed re-aggregation that rebuilds the
    text via sorted-struct arrays — all shuffles are line-keyed or
    doc-keyed; nothing is driver-side and no relation exceeds the
    line stream.  The hot-line set (boilerplate) is usually tiny —
    Spark's AQE will broadcast it when it is.
    """
    import re as _re

    split_pat = _re.escape(sep)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pat)).alias(
            "_pos", "_line"
        ),
    )
    hot = (
        lines.groupBy("_line")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .where(F.col("_docs") >= F.lit(min_repeat))
        .select("_line", F.lit(True).alias("_boiler"))
    )
    flagged = lines.join(hot, "_line", "left").select(
        id_col,
        "_pos",
        "_line",
        F.coalesce("_boiler", F.lit(False)).alias("_boiler"),
    )
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("_boiler"), F.struct("_pos", "_line")
            )
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            kept_sorted.alias("_kept"),
            F.count(F.lit(1)).cast("int").alias("n_lines"),
            F.sum(F.col("_boiler").cast("int")).cast("int").alias(
                "n_removed"
            ),
        )
        .select(
            id_col,
            F.concat_ws(
                sep, F.transform(F.col("_kept"), lambda s: s["_line"])
            ).alias("text"),
            "n_lines",
            "n_removed",
        )
    )


def html_structure_fingerprint(
    df: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """Template fingerprint of a page's markup: appends ``struct_fp``
    (md5 of the opening-tag-name sequence) and ``n_tags``.

    Pages generated from the same template share a tag skeleton even
    when their text differs entirely — grouping by ``struct_fp`` is
    the cheap boilerplate/template-dedup pass that text shingles miss
    (a forum with 10^7 thread pages is ONE fingerprint).  A single
    narrow JVM pass: ``regexp_extract_all`` of ``<tagname`` openings,
    joined and md5-ed; zero shuffles.  The DuckDB oracle runs the
    identical expressions.
    """
    tags = F.expr(
        f"regexp_extract_all(cast({html_col} as string),"
        " '<([a-zA-Z][a-zA-Z0-9]*)', 1)"
    )
    return df.withColumn("_tags", tags).select(
        "*",
        F.md5(F.array_join(F.transform("_tags", F.lower), ",")).alias(
            "struct_fp"
        ),
        F.size("_tags").alias("n_tags"),
    ).drop("_tags")
