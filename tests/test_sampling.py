"""Corpus-curation sampling ops (ops/sampling.py): quality-aware
survivor selection, token-budget greedy cut, deterministic stratified
sampling.  Each is cross-checked against a hand/naive computation; the
driver oracle (DuckDB SQL in __spark_entry__.py) covers the
parquet-scale equivalence."""
import pytest
from pyspark.sql import functions as F

from caterpillar_spark.ops import (
    select_survivors,
    stratified_sample,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, quality, tokens, source)
        (1, 5.0, 10, "a"),
        (2, 9.0, 20, "a"),
        (3, 9.0, 30, "b"),
        (4, 1.0, 40, "b"),
        (5, 7.0, 50, "c"),
        (6, 2.0, 60, "c"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long, source string"
    )


def test_select_survivors_quality_argmax(spark, docs):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (6, 4)],
        "doc_id long, cluster_id long",
    )
    out = {
        r["doc_id"]: r
        for r in select_survivors(docs, clusters, quality_col="quality").collect()
    }
    assert len(out) == 6
    # cluster 1 = {1,2,3}: max quality 9.0 tied between 2 and 3 → min id 2
    for d in (1, 2, 3):
        assert out[d]["survivor_id"] == 2
        assert out[d]["cluster_size"] == 3
    assert out[2]["is_dup"] is False and out[1]["is_dup"] is True
    # cluster 4 = {4,6}: quality 2.0 (doc 6) beats 1.0 (doc 4)
    assert out[4]["survivor_id"] == 6 and out[6]["survivor_id"] == 6
    assert out[4]["is_dup"] is True and out[6]["is_dup"] is False
    # doc 5 is a singleton: survives itself
    assert out[5]["survivor_id"] == 5
    assert out[5]["cluster_size"] == 1 and out[5]["is_dup"] is False


def test_token_budget_sample_greedy_prefix(spark, docs):
    # greedy order by (quality desc, id asc):
    #   2(20) 3(30) 5(50) 1(10) 6(60) 4(40); cumsums 20 50 100 110 170 210
    picked = token_budget_sample(
        docs, budget=110, token_col="n_tokens", priority_col="quality"
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in picked.collect()}
    assert got == {2: 20, 3: 50, 5: 100, 1: 110}


def test_token_budget_sample_edges(spark, docs):
    assert (
        token_budget_sample(
            docs, budget=0, token_col="n_tokens", priority_col="quality"
        ).count()
        == 0
    )
    # budget >= total keeps everything, cum_tokens audits the order
    all_rows = token_budget_sample(
        docs, budget=10_000, token_col="n_tokens", priority_col="quality"
    )
    assert all_rows.count() == 6
    assert all_rows.agg(F.max("cum_tokens")).collect()[0][0] == 210
    # id-only order when no priority column
    by_id = token_budget_sample(docs, budget=60, token_col="n_tokens")
    assert {r["doc_id"] for r in by_id.collect()} == {1, 2, 3}


def test_token_budget_matches_naive_at_scale(spark):
    # 5k docs across 32 partitions: the distributed prefix-sum must
    # equal the single-machine greedy cut exactly.
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, 101)).cast("double").alias("pri"),
        (F.pmod(F.col("id") * 13, 50) + 1).cast("long").alias("n_tokens"),
    )
    rows = sorted(
        df.collect(), key=lambda r: (-r["pri"], r["doc_id"])
    )
    budget, acc, want = 30_000, 0, {}
    for r in rows:
        if acc + r["n_tokens"] > budget:
            break
        acc += r["n_tokens"]
        want[r["doc_id"]] = acc
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(
            df, budget=budget, token_col="n_tokens", priority_col="pri"
        ).collect()
    }
    assert got == want


def test_decontaminate_flags_shared_shingles(spark):
    from caterpillar_spark.ops import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox jumps far away from here"),  # shares 3
            (3, "completely different words with no overlap at all"),
            (4, "quick brown fox"),  # exactly n tokens → one shingle
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps high",)], "text string"
    )
    out = {
        r["doc_id"]: (r["contam_hits"], r["is_contaminated"])
        for r in decontaminate(docs, bench, shingle_n=3, min_hits=2).collect()
    }
    # bench 3-shingles: {the quick brown, quick brown fox, brown fox
    # jumps, fox jumps high}; doc1 shares 3, doc2 shares 2, doc3 none,
    # doc4's single shingle matches once — below min_hits=2.
    assert out == {1: (3, True), 2: (2, True), 3: (0, False), 4: (1, False)}
    # the benchmark side must be broadcast (no corpus shuffle)
    plan = decontaminate(docs, bench, shingle_n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_deterministic_and_nested(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", 4).cast("string")).alias("source"),
    )
    half = stratified_sample(df, {"s0": 0.5, "s1": 0.5}, seed=3)
    half2 = stratified_sample(df, {"s0": 0.5, "s1": 0.5}, seed=3)
    a = {r["doc_id"] for r in half.collect()}
    assert a == {r["doc_id"] for r in half2.collect()}  # reproducible
    # default_rate=0 drops unmapped sources entirely
    srcs = {r["source"] for r in half.select("source").distinct().collect()}
    assert srcs <= {"s0", "s1"}
    # rates are honored within a few percent at n=500/source
    n0 = half.where(F.col("source") == "s0").count()
    assert 200 < n0 < 300
    # nested: raising the rate strictly grows the sample
    fuller = stratified_sample(df, {"s0": 0.9, "s1": 0.9}, seed=3)
    b = {r["doc_id"] for r in fuller.collect()}
    assert a <= b
    # rate 1.0 keeps every row of that source
    all_s2 = stratified_sample(df, {"s2": 1.0}, seed=3)
    assert all_s2.count() == 500
    # a different seed selects a different set
    other = stratified_sample(df, {"s0": 0.5, "s1": 0.5}, seed=4)
    assert a != {r["doc_id"] for r in other.collect()}


def test_pack_sequences_offsets(spark, docs):
    """Offsets equal the naive id-ordered cumulative sum; chunk math
    is consistent; the layout is a pure function of the corpus."""
    from caterpillar_spark.ops import pack_sequences

    out = {
        r["doc_id"]: r for r in pack_sequences(docs, seq_len=50).collect()
    }
    # docs fixture tokens by id: 1:10 2:20 3:30 4:40 5:50 6:60
    want_start = {1: 0, 2: 10, 3: 30, 4: 60, 5: 100, 6: 150}
    assert {d: r["start_offset"] for d, r in out.items()} == want_start
    for d, r in out.items():
        assert r["chunk_id"] == want_start[d] // 50
        assert r["chunk_pos"] == want_start[d] % 50
    # deterministic across runs
    again = {
        r["doc_id"]: r["start_offset"]
        for r in pack_sequences(docs, seq_len=50).collect()
    }
    assert again == want_start
