"""Driver-side scalar helpers: XXH64 parity with Spark's xxhash64.

The bucket-pruning paths (query/engine.py _pruned_postings,
query/wand.py _prune_terms) compute ``pmod(xxhash64(term), nb)``
driver-side; this parity pin is what makes that safe — any divergence
would silently prune the wrong partitions and drop results.
"""

from pyspark.sql import functions as F

from caterpillar_spark.functions import spark_xxhash64


def test_xxhash64_parity_with_spark(spark):
    cases = (
        [""]
        + ["a" * n for n in range(1, 41)]  # every tail-length branch
        + ["spark", "table", "join", "hash", "the", "一", "naïve",
           "日本語テキスト", "emoji 😀 mixed", "x" * 100, "tëst" * 20,
           "word-with-punct!", " leading space"]
    )
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for c in cases:
        assert spark_xxhash64(c) == got[c], c


def test_bucket_assignment_matches_pmod(spark):
    terms = ["spark", "table", "join", "the", "data", "vector", "stream"]
    for nb in (4, 8, 16, 64):
        want = {
            r["t"]: r["b"]
            for r in spark.createDataFrame([(t,) for t in terms], "t string")
            .select(
                F.col("t"),
                F.pmod(F.xxhash64("t"), F.lit(nb)).cast("int").alias("b"),
            )
            .collect()
        }
        for t in terms:
            assert spark_xxhash64(t) % nb == want[t]
