"""Incremental link-graph maintenance (streaming/linkstream.py):
delta appends via foreachBatch, exact merge-on-read, replay
idempotency, ledger-guarded compaction."""
import os

from pyspark.sql import functions as F

from caterpillar_spark.ops import extract_links, host_link_edges
from caterpillar_spark.sources.webtext import synthetic_webtext
from caterpillar_spark.streaming import (
    append_link_batch,
    compact_link_edges,
    merged_link_edges,
    start_link_stream,
)


def _edge_map(df):
    return {
        (r.src_host, r.dst_host): r.n_links for r in df.collect()
    }


def test_linkstream_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "landing")
    path = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    full = synthetic_webtext(spark, 240, seed=31, partitions=1).cache()
    a_urls = [r.url for r in full.limit(120).select("url").collect()]
    batch_a = full.where(F.col("url").isin(a_urls))
    batch_b = full.where(~F.col("url").isin(a_urls))
    batch_a.coalesce(1).write.mode("append").parquet(landing)

    q = start_link_stream(spark, landing, path, ckpt)
    q.awaitTermination(120)

    batch_b.coalesce(1).write.mode("append").parquet(landing)
    q2 = start_link_stream(spark, landing, path, ckpt)
    q2.awaitTermination(120)

    want = _edge_map(host_link_edges(extract_links(full)))
    got = _edge_map(merged_link_edges(spark, path))
    assert got == want

    # replaying an already-applied batch (same run_id as the stream,
    # derived from the checkpoint path) overwrites its own partition:
    # merged counts unchanged
    import hashlib

    run_id = hashlib.md5(os.path.abspath(ckpt).encode()).hexdigest()[:8]
    append_link_batch(batch_a, path, 0, run_id=run_id)
    assert _edge_map(merged_link_edges(spark, path)) == want

    # the SAME batch id from a DIFFERENT run (fresh checkpoint) is a
    # different key: it must land as a new delta, not overwrite or be
    # dropped — its edges double the counts for batch A's pairs
    append_link_batch(batch_a, path, 0, run_id="otherrun")
    redoubled = _edge_map(merged_link_edges(spark, path))
    assert redoubled != want
    a_edges = _edge_map(host_link_edges(extract_links(batch_a)))
    for k, v in a_edges.items():
        assert redoubled[k] == want[k] + v

    # compaction folds everything into a versioned base; merged view
    # identical; the folded batch partitions are gone
    compact_link_edges(spark, path)
    want_plus = dict(redoubled)
    deltas_dir = os.path.join(path, "deltas")
    assert not os.path.isdir(deltas_dir) or not any(
        e.startswith("batch_id=") for e in os.listdir(deltas_dir)
    )
    assert os.path.isdir(os.path.join(path, "base_v1"))
    assert _edge_map(merged_link_edges(spark, path)) == want_plus

    # a replay of a compacted batch is dropped by the ledger
    append_link_batch(batch_a, path, 0, run_id=run_id)
    assert _edge_map(merged_link_edges(spark, path)) == want_plus

    # crash-consistency: even if a folded delta REAPPEARS on disk
    # (compaction interrupted before its cleanup), the read path
    # excludes it via the ledger — no double counting
    import json as _json

    with open(os.path.join(path, "link_ledger.json")) as fh:
        led = _json.load(fh)
    assert f"{run_id}-0" in led["batch_ids"] and led["base"] == "base_v1"
    # force-write batch 0's delta again, bypassing the ledger guard
    from caterpillar_spark.ops import extract_links as _el, host_link_edges as _hle
    d0 = _hle(_el(batch_a)).withColumn("batch_id", F.lit(f"{run_id}-0"))
    d0.write.mode("append").partitionBy("batch_id").parquet(deltas_dir)
    assert _edge_map(merged_link_edges(spark, path)) == want_plus

    # a genuinely new batch lands as a fresh delta and merges in
    extra = synthetic_webtext(spark, 300, seed=31, partitions=1).where(
        ~F.col("url").isin([r.url for r in full.select("url").collect()])
    )
    append_link_batch(extra, path, 99, run_id=run_id)
    extra_edges = _edge_map(host_link_edges(extract_links(extra)))
    want3 = dict(want_plus)
    for k, v in extra_edges.items():
        want3[k] = want3.get(k, 0) + v
    assert _edge_map(merged_link_edges(spark, path)) == want3
    full.unpersist()
