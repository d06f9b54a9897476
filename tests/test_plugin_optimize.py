"""Plugin state store (reference AnalyticsPlugin analog) and index
compaction."""

import os

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames
from caterpillar_spark.indexing.build import build_index, optimize_index
from caterpillar_spark.query import search
from caterpillar_spark.query.plugin import (
    AnalyticsPlugin,
    list_plugins,
    plugin_state,
    run_plugin,
)
from caterpillar_spark.sources import ingest_webtext, synthetic_webtext


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = ingest_webtext(synthetic_webtext(spark, 120, seed=9))
    frames = build_frames(docs, metadata_cols=["lang"]).persist()
    path = str(tmp_path_factory.mktemp("pidx") / "idx")
    idx = build_index(frames, path, num_buckets=4, checkpoint_groups=2)
    frames.unpersist()
    return idx


def test_plugin_run_cache_and_state(built):
    calls = []

    def top_terms(index):
        calls.append(1)
        return {
            "top_terms": index.term_stats()
            .groupBy("term")
            .agg(F.sum("total_occurrences").alias("occ"))
            .orderBy(F.desc("occ"), F.asc("term"))
            .limit(20)
        }

    plugin = AnalyticsPlugin("top_terms", top_terms, settings={"k": 20})
    entry = run_plugin(built, plugin)
    assert entry["revision"] == built.manifest["revision"]
    assert "top_terms" in entry["tables"]

    # cached: same settings + same revision -> no recompute
    run_plugin(built, plugin)
    assert len(calls) == 1
    # different settings -> fresh state dir
    p2 = AnalyticsPlugin("top_terms", top_terms, settings={"k": 5})
    run_plugin(built, p2)
    assert len(calls) == 2
    assert len(list_plugins(built)) == 2

    state = plugin_state(built, "top_terms", plugin.settings_id, "top_terms")
    rows = state.collect()
    assert 0 < len(rows) <= 20
    occs = [r["occ"] for r in rows]
    assert occs == sorted(occs, reverse=True)


def test_optimize_compacts_and_preserves_results(built):
    def n_files(sub):
        total = 0
        for root, _, files in os.walk(os.path.join(built.path, sub)):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    before = search(
        built, k=10, unit="document", should=["the", "data"], scorer="bm25"
    ).collect()
    files_before = n_files("postings")
    rev_before = built.manifest["revision"]

    idx2 = optimize_index(built)
    assert idx2.manifest["revision"] == rev_before + 1
    assert n_files("postings") <= files_before
    # exactly one file per occupied bucket partition
    for sub in ("postings", "lists"):
        root = os.path.join(built.path, sub)
        for d in os.listdir(root):
            if d.startswith("term_bucket="):
                pq = [f for f in os.listdir(os.path.join(root, d))
                      if f.endswith(".parquet")]
                assert len(pq) == 1

    after = search(
        idx2, k=10, unit="document", should=["the", "data"], scorer="bm25"
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in before] == [
        (r["doc_id"], round(r["score"], 9)) for r in after
    ]
