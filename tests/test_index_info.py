"""index_info (indexing/build.py): operational snapshot of a persisted index."""

from caterpillar_spark.framing import build_frames
from caterpillar_spark.indexing.build import build_index, index_info


def test_index_info_snapshot(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    idx = build_index(
        build_frames(docs, text_cols=["text"], frame_size=0),
        str(tmp_path / "idx"),
        num_buckets=4,
        with_positions=True,
    )
    info = index_info(idx)
    assert info["revision"] == 1
    assert info["num_buckets"] == 4 and info["with_positions"] is True
    assert info["n_docs"] == 6
    assert info["vocabulary_size"] == 3
    assert info["total_tokens"] == sum(3 * (i + 1) for i in range(6))
    for layout in ("postings", "lists", "positions", "docs", "term_stats"):
        assert info["layouts"][layout]["bytes"] > 0, layout
    assert info["total_bytes"] == sum(
        v["bytes"] for v in info["layouts"].values()
    )
