"""Vector extraction / inversion / range-scan / attribute operators and
persisted-index document deletion."""

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.framing import build_frames, frames_to_postings
from caterpillar_spark.query.vectors import (
    attribute_filter,
    filter_range,
    metadata_inversion,
    tf_vectors,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def frames(docs):
    f = build_frames(docs, metadata_cols=["lang", "n_chars"]).persist()
    f.count()
    return f


@pytest.fixture(scope="module")
def postings(frames):
    return frames_to_postings(frames)


def test_tf_vectors_frame_unit(postings):
    vecs = tf_vectors(postings, unit="frame")
    row = vecs.where(F.col("doc_id") == 1).collect()[0]
    manual = {
        (r["term"]): r["freq"]
        for r in postings.where(
            (F.col("doc_id") == 1) & (F.col("frame_seq") == row["frame_seq"])
        ).collect()
    }
    assert {v["term"]: v["freq"] for v in row["vector"]} == manual
    terms = [v["term"] for v in row["vector"]]
    assert terms == sorted(terms)


def test_vocabulary_ordering(postings):
    vocab = vocabulary(postings).collect()
    by_id = sorted(vocab, key=lambda r: r["term_id"])
    freqs = [r["total_freq"] for r in by_id]
    assert freqs == sorted(freqs, reverse=True)
    assert [r["term_id"] for r in by_id] == list(range(1, len(by_id) + 1))
    # ties broken term-asc within equal frequency
    for a, b in zip(by_id, by_id[1:]):
        if a["total_freq"] == b["total_freq"]:
            assert a["term"] < b["term"]


def test_vocabulary_no_single_partition_exchange(postings, spark):
    """Dense-id assignment must stay JVM-side and parallel: the global
    order comes from a range-partitioned Exchange, ranking runs as a
    per-partition-id Window (never SinglePartition), and no
    Python-evaluation stage (``.rdd`` round-trip / BatchEvalPython /
    ExistingRDD scan) appears anywhere in the executed plan — the r2
    ``zipWithIndex`` shape pushed every vocabulary row through Python
    serde."""
    from caterpillar_spark.query.vectors import _vocabulary_plan

    ranged, out = _vocabulary_plan(postings)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        ranged.unpersist()
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan
    assert "ExistingRDD" not in plan


def test_vocabulary_unpersists_intermediate(postings, spark):
    """The r3 advisory: vocabulary() persisted its range-partitioned
    intermediate and never unpersisted it, leaking cached partitions
    per call for the session.  Now the only blocks left after a call
    belong to the returned relation's localCheckpoint (released by the
    ContextCleaner when the result is dropped — handle-scoped
    ownership); the plain persist is gone."""
    jsc = spark.sparkContext._jsc.sc()
    before = {info.id() for info in jsc.getRDDStorageInfo()}
    res = vocabulary(postings)
    n = res.count()
    assert n > 0
    new = [
        info
        for info in jsc.getRDDStorageInfo()
        if info.id() not in before
    ]
    # exactly one new cached RDD may survive — and the returned
    # relation must be a scan OF it (its localCheckpoint), proving the
    # intermediate persist was released: a leaked `ranged` would be a
    # second surviving entry / a non-checkpoint plan.
    assert len(new) <= 1
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_metadata_inversion_partitions_total(frames):
    """The flat (field, value, n, id) primary partitions the corpus:
    one row per (value, id), n consistent across a value's rows."""
    inv = metadata_inversion(frames, ["lang"], unit="document").collect()
    n_docs = frames.select("doc_id").distinct().count()
    assert len(inv) == n_docs
    by_value = {}
    for r in inv:
        by_value.setdefault(r["value"], []).append(r)
    assert sum({v: rs[0]["n"] for v, rs in by_value.items()}.values()) == n_docs
    for v, rs in by_value.items():
        assert {r["n"] for r in rs} == {len(rs)}
        assert len({r["id"] for r in rs}) == len(rs)


def test_metadata_inversion_scale_path_no_arrays(frames):
    """The scale-path plan must not contain any per-value array
    aggregation (collect_list was the r2 OOM-on-skew shape)."""
    inv = metadata_inversion(frames, ["lang"], unit="document")
    plan = inv._jdf.queryExecution().analyzed().toString()
    assert "collect_list" not in plan
    # the convenience array form agrees with the flat primary
    from caterpillar_spark.query.vectors import metadata_inversion_arrays

    arrays = {
        (r["field"], r["value"]): (r["n"], list(r["ids"]))
        for r in metadata_inversion_arrays(
            frames, ["lang"], unit="document"
        ).collect()
    }
    flat = {}
    for r in inv.collect():
        flat.setdefault((r["field"], r["value"]), []).append(r["id"])
    assert set(arrays) == set(flat)
    for key, (n, ids) in arrays.items():
        assert n == len(flat[key])
        assert ids == sorted(flat[key])


def test_filter_range_keyset(docs):
    got = [
        r["doc_id"]
        for r in filter_range(
            docs.select("doc_id"), start=100, end=400, limit=50
        ).collect()
    ]
    want = sorted(
        r["doc_id"]
        for r in docs.where(
            (F.col("doc_id") > 100) & (F.col("doc_id") <= 400)
        ).collect()
    )[:50]
    assert got == want


def test_attribute_filter_conjunction(spark, frames):
    attrs = frames.select(
        "doc_id",
        "frame_seq",
        F.lit("length_class").alias("type"),
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("value"),
    ).unionAll(
        frames.select(
            "doc_id",
            "frame_seq",
            F.lit("lang_tag").alias("type"),
            F.col("lang").alias("value"),
        )
    )
    out = attribute_filter(
        frames, attrs, {"length_class": {"=": "long"}, "lang_tag": {"=": "en"}}
    )
    expect = frames.where(
        (F.col("n_chars") >= 300) & (F.col("lang") == "en")
    ).count()
    assert out.count() == expect


def test_attribute_filter_wildcard_and_numeric(spark, frames):
    """Reference FIELD_OPS parity on the attribute path: anchored ``*=``
    wildcard (equals_wildcard = re.match, schema.py:200-201) and numeric
    comparison through the declared cast — string-stored '99' must NOT
    satisfy ``{'>=': 350}`` the way lexicographic compare would."""
    attrs = frames.select(
        "doc_id",
        "frame_seq",
        F.lit("length_class").alias("type"),
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("value"),
    ).unionAll(
        frames.select(
            "doc_id", "frame_seq",
            F.lit("chars").alias("type"),
            F.col("n_chars").cast("string").alias("value"),
        )
    )
    # anchored wildcard: 'lo.' matches 'long', not 'short'; '.ort'
    # does NOT match 'short' (anchored at start, like re.match)
    wild = attribute_filter(frames, attrs, {"length_class": {"*=": "lo."}})
    assert wild.count() == frames.where(F.col("n_chars") >= 300).count()
    assert (
        attribute_filter(frames, attrs, {"length_class": {"*=": ".ort"}}).count()
        == 0
    )
    # numeric range through the cast vs the lexicographic trap
    num = attribute_filter(
        frames, attrs, {"chars": {">=": 350}}, value_types={"chars": "numeric"}
    )
    want = frames.where(F.col("n_chars") >= 350).count()
    lex = frames.where(F.col("n_chars").cast("string") >= "350").count()
    assert num.count() == want
    assert want != lex  # the corpus genuinely distinguishes the two
    # untyped comparison keeps the (documented) string semantics
    untyped = attribute_filter(frames, attrs, {"chars": {">=": "350"}})
    assert untyped.count() == lex


def test_delete_documents(spark, docs, tmp_path):
    from caterpillar_spark.indexing.build import build_index, delete_documents
    from caterpillar_spark.query import search
    from caterpillar_spark.query.wand import wand_topk

    frames = build_frames(docs.limit(80), metadata_cols=["lang"]).persist()
    path = str(tmp_path / "idx")
    idx = build_index(frames, path, num_buckets=4, checkpoint_groups=1)
    rev0 = idx.manifest["revision"]
    n0 = idx.manifest["n_docs"]

    victims = [r["doc_id"] for r in frames.select("doc_id").distinct().limit(3).collect()]
    idx2 = delete_documents(idx, victims)

    assert idx2.manifest["revision"] == rev0 + 1
    assert idx2.manifest["n_docs"] == n0 - 3
    assert idx2.postings().where(F.col("doc_id").isin(victims)).count() == 0
    assert idx2.lists().count() > 0

    hits = search(idx2, k=50, unit="document", should=["the", "a", "data"])
    assert hits.where(F.col("doc_id").isin(victims)).count() == 0
    wand_hits = wand_topk(idx2.compressed(), ["the", "data"], k=50).collect()
    assert all(r["doc_id"] not in set(victims) for r in wand_hits)
    frames.unpersist()


def test_swap_dir_crash_recovery(spark, frames, tmp_path):
    """A crash inside _swap_dir's rename pair can leave a table only at
    <name>.old; InvertedIndex readers must recover it at open time."""
    import os
    import shutil

    from caterpillar_spark.indexing.build import InvertedIndex, build_index

    path = str(tmp_path / "idx")
    idx = build_index(frames, path, num_buckets=4)
    n = idx.term_stats().count()

    # simulate: final renamed aside, staged rename never happened
    ts = os.path.join(path, "term_stats")
    os.rename(ts, ts + ".old")
    assert not os.path.exists(ts)

    fresh = InvertedIndex(spark, path)
    assert fresh.term_stats().count() == n  # recovered
    assert os.path.isdir(ts) and not os.path.exists(ts + ".old")
    shutil.rmtree(path)


def test_persisted_attributes(spark, frames, tmp_path):
    """add_attributes appends a partitioned attributes table with
    conflict-ignore dedupe and a revision bump; attribute_filter over
    the stored table matches the in-memory side relation."""
    from caterpillar_spark.indexing import add_attributes, build_index

    path = str(tmp_path / "idx")
    idx = build_index(frames, path, num_buckets=4)
    rev0 = idx.manifest["revision"]

    attrs = frames.select(
        "doc_id",
        "frame_seq",
        F.lit("length_class").alias("type"),
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("value"),
    )
    idx = add_attributes(idx, attrs)
    assert idx.manifest["revision"] == rev0 + 1
    n_stored = idx.attributes().count()
    assert n_stored == attrs.dropDuplicates(
        ["doc_id", "frame_seq", "type", "value"]
    ).count()

    # re-append is a no-op on the data (conflict-ignore), revision bumps
    idx = add_attributes(idx, attrs)
    assert idx.attributes().count() == n_stored
    assert idx.manifest["revision"] == rev0 + 2

    # a second attribute type lands in its own partition directory
    sent = frames.select(
        "doc_id", "frame_seq",
        F.lit("sentiment").alias("type"),
        F.when(F.col("doc_id") % 2 == 0, "pos").otherwise("neg").alias("value"),
    )
    idx = add_attributes(idx, sent)
    assert idx.attributes().select("type").distinct().count() == 2

    # stored-path filtering == in-memory side-relation filtering
    stored = attribute_filter(
        frames, idx.attributes(), {"length_class": {"=": "long"}}
    )
    mem = attribute_filter(frames, attrs, {"length_class": {"=": "long"}})
    assert stored.count() == mem.count() > 0
    # conjunction across types intersects
    both = attribute_filter(
        frames, idx.attributes(),
        {"length_class": {"=": "long"}, "sentiment": {"=": "pos"}},
    )
    assert both.count() == stored.where(F.col("doc_id") % 2 == 0).count()


def test_delete_preserves_all_stopped_frames(spark, tmp_path):
    """r5: field statistics after a delete rebuild from the doc_fields
    ledger, so a frame whose tokens were ALL stop-marked (no postings)
    keeps contributing its frame/token counts — the r2-r4 documented
    pseudo-frame deviation is closed on ledger-carrying indexes."""
    from caterpillar_spark.analysis.analyser import DefaultAnalyser
    from caterpillar_spark.indexing.build import build_index, delete_documents

    docs2 = spark.createDataFrame(
        [
            (1, "alpha beta gamma. xx yy."),     # frame 1 all-stopped
            (2, "delta alpha words here."),
            (3, "gamma words again today."),
        ],
        "doc_id long, text string",
    )
    fr = build_frames(
        docs2,
        text_cols=["text"],
        frame_size=1,
        analyser=DefaultAnalyser(stopword_list=["xx", "yy"]),
    )
    idx = build_index(fr, str(tmp_path / "idx"), num_buckets=4)
    assert idx.has_doc_fields()
    before = idx.field_stats().collect()[0]
    # the all-stopped frame is real: doc 1 has 2 frames in the ledger
    # ("alpha beta gamma" = 3 tokens + "xx yy" = 2 stopped tokens — the
    # position counter advances over stopped tokens, framing.py)
    lg = {
        (r["doc_id"]): (r["frame_count"], r["token_count"])
        for r in idx.doc_fields().collect()
    }
    assert lg[1] == (2, 5)

    idx = delete_documents(idx, [3])
    after = idx.field_stats().collect()[0]
    assert after["frame_count"] == before["frame_count"] - 1
    assert after["token_count"] == before["token_count"] - 4
    assert after["doc_count"] == 2
    # the ledger itself dropped doc 3 and kept doc 1's stopped frame
    lg2 = {
        r["doc_id"]: (r["frame_count"], r["token_count"])
        for r in idx.doc_fields().collect()
    }
    assert 3 not in lg2 and lg2[1] == (2, 5)


def test_append_extends_doc_fields_ledger(spark, tmp_path):
    from caterpillar_spark.indexing.build import build_index
    from caterpillar_spark.streaming.incremental import append_batch

    base = build_frames(
        spark.createDataFrame([(1, "one two three")], "doc_id long, text string"),
        text_cols=["text"], frame_size=0,
    )
    idx = build_index(base, str(tmp_path / "idx"), num_buckets=4)
    extra = build_frames(
        spark.createDataFrame([(2, "four five")], "doc_id long, text string"),
        text_cols=["text"], frame_size=0,
    )
    idx = append_batch(extra, str(tmp_path / "idx"))
    lg = {r["doc_id"]: r["token_count"] for r in idx.doc_fields().collect()}
    assert lg == {1: 3, 2: 2}
