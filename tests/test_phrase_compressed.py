"""Phrase/n-gram search over the compressed positions layout (r3
verdict #4) must match the DataFrame engine's raw-postings path exactly
— same frames, same match counts — including through persisted-index
build, incremental append, and delete."""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames, frames_to_postings
from caterpillar_spark.indexing.postinglists import (
    build_position_lists,
    decode_position_row,
)
from caterpillar_spark.query.analytics import search_ngram
from caterpillar_spark.query.phrase import search_ngram_compressed


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frames = build_frames(docs, metadata_cols=["lang"]).persist()
    frames.count()
    posts = frames_to_postings(frames)
    yield posts
    frames.unpersist()


def _norm_engine(df):
    return sorted(
        (r["doc_id"], r["frame_seq"], r["matches"]) for r in df.collect()
    )


def _norm_compressed(df):
    return sorted(
        (r["doc_id"], r["frame_seq"], r["matches"]) for r in df.collect()
    )


@pytest.mark.parametrize("terms", [["spark", "join"], ["the", "table"]])
def test_matches_engine_on_corpus(spark, corpus, terms):
    pos = build_position_lists(corpus, num_buckets=8, block_bits=3)
    got = _norm_compressed(
        search_ngram_compressed(pos, terms, num_buckets=8, block_bits=3)
    )
    want = _norm_engine(search_ngram(corpus, terms))
    assert got == want
    assert got, f"vacuous parity: {terms} never adjacent in the corpus"


def test_trigram_and_multiframe(spark):
    """Known counts on a crafted corpus: repeated trigram inside one
    frame, the same bigram in several frames of one document, and a
    cross-frame near-miss that must NOT match."""
    docs = spark.createDataFrame(
        [
            (1, "big data rocks big data rocks here. big data rocks again here today."),
            (2, "data rocks but big is elsewhere. nothing here. big data rocks."),
            (3, "big ends a frame. data rocks starts another."),
        ],
        "doc_id long, text string",
    )
    frames = build_frames(docs, frame_size=1)
    posts = frames_to_postings(frames)
    pos = build_position_lists(posts, num_buckets=4, block_bits=2)

    got3 = _norm_compressed(
        search_ngram_compressed(pos, ["big", "data", "rocks"], 4, 2)
    )
    want3 = _norm_engine(search_ngram(posts, ["big", "data", "rocks"]))
    assert got3 == want3
    by_doc = {}
    for d, fs, m in got3:
        by_doc.setdefault(d, 0)
        by_doc[d] += m
    assert by_doc[1] == 3  # two in frame 0, one in frame 1
    assert by_doc[2] == 1
    assert 3 not in by_doc  # positions never cross a frame boundary


@pytest.mark.parametrize("terms", [["spark", "join"], ["the", "table"]])
def test_doc_intersection_pruning_parity(spark, corpus, terms):
    """r5 hot-term pruning: passing doc_lists co-shuffles the doc-gap
    lists, intersects per block, and decodes positions only for
    surviving docs — results must be identical to the unpruned kernel
    and the raw-postings engine."""
    from caterpillar_spark.indexing.postinglists import build_posting_lists

    pos = build_position_lists(corpus, num_buckets=8, block_bits=3)
    lists = build_posting_lists(corpus, num_buckets=8, block_bits=3)
    got = _norm_compressed(
        search_ngram_compressed(
            pos, terms, num_buckets=8, block_bits=3, doc_lists=lists
        )
    )
    assert got == _norm_engine(search_ngram(corpus, terms))
    assert got, f"vacuous parity: {terms} never adjacent in the corpus"


def test_filtered_decode_matches_full(spark):
    """decode_position_row_filtered(row, all-docs) == decode_position_row;
    a restricted keep-set returns exactly those docs' frames."""
    from caterpillar_spark.indexing.postinglists import (
        decode_position_row_filtered,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    posts = frames_to_postings(build_frames(docs, frame_size=0))
    rows = build_position_lists(posts, num_buckets=4, block_bits=2).collect()
    for row in rows:
        full = decode_position_row(row)
        all_docs = {d for d, _, _ in full}
        got = decode_position_row_filtered(row, all_docs)
        assert [(d, f, list(p)) for d, f, p in got] == [
            (d, f, list(p)) for d, f, p in full
        ]
        keep = {sorted(all_docs)[0]}
        sub = decode_position_row_filtered(row, keep)
        assert {d for d, _, _ in sub} == (keep & all_docs)


def test_position_codec_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    posts = frames_to_postings(build_frames(docs, frame_size=0))
    rows = build_position_lists(posts, num_buckets=4, block_bits=2).collect()
    originals = {
        (r["term"], r["doc_id"], r["frame_seq"]): list(r["positions"])
        for r in posts.collect()
    }
    seen = 0
    for row in rows:
        for doc, fseq, positions in decode_position_row(row):
            assert list(positions) == originals[(row["term"], doc, fseq)]
            seen += 1
    assert seen == len(originals)


def test_persisted_index_phrase_lifecycle(spark, tmp_path):
    """with_positions build -> phrase search -> append a doc containing
    the phrase -> found; delete it -> gone.  Every step runs over the
    compressed positions table only."""
    from caterpillar_spark.indexing.build import build_index, delete_documents
    from caterpillar_spark.query.phrase import search_ngram_index
    from caterpillar_spark.streaming.incremental import append_batch

    docs = spark.createDataFrame(
        [(1, "varint codec rules the block. nothing else."),
         (2, "no phrase here at all.")],
        "doc_id long, text string",
    )
    frames = build_frames(docs, frame_size=1)
    idx = build_index(
        frames, str(tmp_path / "idx"), num_buckets=4, block_bits=2,
        with_positions=True,
    )
    hits = search_ngram_index(idx, ["varint", "codec"]).collect()
    assert [(r["doc_id"], r["matches"]) for r in hits] == [(1, 1)]

    newdoc = spark.createDataFrame(
        [(3, "fresh varint codec mention. varint codec twice.")],
        "doc_id long, text string",
    )
    idx = append_batch(build_frames(newdoc, frame_size=1), str(tmp_path / "idx"))
    hits = sorted(
        (r["doc_id"], r["matches"])
        for r in search_ngram_index(idx, ["varint", "codec"]).collect()
    )
    assert hits == [(1, 1), (3, 1), (3, 1)]  # doc 3: one per frame

    # compaction rewrites the positions table too (one sorted run per
    # bucket) and must preserve the matches
    from caterpillar_spark.indexing.build import optimize_index

    idx = optimize_index(idx)
    hits = sorted(
        (r["doc_id"], r["matches"])
        for r in search_ngram_index(idx, ["varint", "codec"]).collect()
    )
    assert hits == [(1, 1), (3, 1), (3, 1)]

    idx = delete_documents(idx, [3])
    hits = [(r["doc_id"], r["matches"])
            for r in search_ngram_index(idx, ["varint", "codec"]).collect()]
    assert hits == [(1, 1)]
