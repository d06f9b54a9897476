"""End-to-end index build + query tests.

Golden counts ported from the reference suite
(processing/test/test_index_search.py:383-427, test_index.py:52-61),
run on the reference's public-domain alice corpus.  All goldens are
reference-exact: the rule-based Punkt replacement (analysis/sentence.py)
reproduces the stored reference index's segmentation byte-for-byte on
this corpus (1153/1153 frames).
"""

import os
import shutil

import pytest

from pyspark.sql import Row, functions as F

from caterpillar_spark.analysis import TestAnalyser
from caterpillar_spark.framing import build_frames, frames_to_postings
from caterpillar_spark.indexing import build_index
from caterpillar_spark.query import (
    MemoryIndex,
    boost,
    exclude,
    filter_frames,
    filter_metadata,
    match_all,
    match_any,
    score_and_rank,
    search,
)
from caterpillar_spark.query.composition import from_scored

REF_RESOURCES = "/root/reference/caterpillar/test_resources"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_RESOURCES), reason="reference corpus not available"
)


@pytest.fixture(scope="module")
def alice_index(spark):
    with open(os.path.join(REF_RESOURCES, "alice.txt")) as f:
        text = f.read()
    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    frames = build_frames(docs, analyser=TestAnalyser(), frame_size=2)
    frames = frames.cache()
    frames.count()
    idx = MemoryIndex(frames)
    # Materialize the stats once; MemoryIndex recomputes lazily otherwise.
    yield idx
    frames.unpersist()


@needs_ref
class TestAliceGoldens:
    def n(self, idx, **kw):
        return filter_frames(idx, **kw).count()

    def test_should_single(self, alice_index):
        assert self.n(alice_index, should=["King"]) == 59

    def test_should_union(self, alice_index):
        assert self.n(alice_index, should=["King", "Queen"]) == 122

    def test_must(self, alice_index):
        assert self.n(alice_index, must=["King", "Queen"]) == 4

    def test_must_not(self, alice_index):
        assert self.n(alice_index, should=["King"], must_not=["Queen"]) == 55

    def test_compound_name_token(self, alice_index):
        assert self.n(alice_index, should=["Mock Turtle"]) == 51

    def test_voice(self, alice_index):
        assert self.n(alice_index, should=["voice"]) == 46

    def test_term_variants(self, alice_index):
        assert self.n(alice_index, must=["Alice", ("thought", "little")]) == 69

    def test_at_least_n(self, alice_index):
        n2 = self.n(alice_index, at_least_n=(2, ["King", "Queen", "voice"]))
        n_pairs = (
            self.n(alice_index, must=["King", "Queen"])
            + self.n(alice_index, must=["King", "voice"])
            + self.n(alice_index, must=["Queen", "voice"])
            - 2 * self.n(alice_index, must=["King", "Queen", "voice"])
        )
        assert n2 == n_pairs

    def test_set_algebra_invariant(self, alice_index):
        # |A∪B| = |A∧B| + |A\B| + |B\A| (reference test_index_search.py:93-112)
        a, b = "King", "Queen"
        union = self.n(alice_index, should=[a, b])
        inter = self.n(alice_index, must=[a, b])
        a_not_b = self.n(alice_index, should=[a], must_not=[b])
        b_not_a = self.n(alice_index, should=[b], must_not=[a])
        assert union == inter + a_not_b + b_not_a

    def test_missing_term_early_exit(self, alice_index):
        assert self.n(alice_index, should=["zzzqqqxxx"]) == 0

    def test_requires_positive_term(self, alice_index):
        with pytest.raises(ValueError):
            filter_frames(alice_index, must_not=["King"])

    def test_rank_deterministic_and_scored(self, alice_index):
        top = search(alice_index, k=10, should=["King", "Queen"]).collect()
        assert len(top) == 10
        scores = [r["score"] for r in top]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        again = search(alice_index, k=10, should=["King", "Queen"]).collect()
        assert top == again

    def test_pagination_keyset(self, alice_index):
        full = search(alice_index, k=20, should=["King", "Queen"]).collect()
        first = full[:7]
        last = first[-1]
        rest = search(
            alice_index,
            k=13,
            should=["King", "Queen"],
            pagination=(
                last["score"], (last["doc_id"], last["field"], last["frame_seq"])
            ),
        ).collect()
        assert full[7:] == rest

    def test_bm25_rank_sane(self, alice_index):
        top = search(alice_index, k=5, should=["King"], scorer="bm25").collect()
        assert len(top) == 5
        assert all(r["score"] > 0 for r in top)

    def test_document_unit(self, alice_index):
        docs = filter_frames(alice_index, should=["King"], unit="document").collect()
        assert len(docs) == 1  # single-document corpus
        # Document score is the sum of its frame scores (sqlite.py:1219-1222).
        frame_sum = (
            filter_frames(alice_index, should=["King"])
            .agg(F.sum("score"))
            .collect()[0][0]
        )
        assert abs(docs[0]["score"] - frame_sum) < 1e-9


@needs_ref
def test_alice_frame_and_vocab_counts(spark):
    with open(os.path.join(REF_RESOURCES, "alice_test_data.txt")) as f:
        text = f.read()
    docs = spark.createDataFrame([Row(doc_id=1, text=text)])
    frames = build_frames(docs, analyser=TestAnalyser(), frame_size=2)
    posts = frames_to_postings(frames)
    assert frames.count() == 52  # reference-exact (test_index.py:52-61)
    assert posts.select("term").distinct().count() == 500
    assert posts.where(F.col("term") == "Alice").count() == 23


def test_composition_algebra(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana. apple cherry."),
            Row(doc_id=2, text="banana cherry. banana date."),
            Row(doc_id=3, text="apple banana cherry date."),
            Row(doc_id=4, text="elderberry fig."),
        ]
    )
    idx = MemoryIndex(build_frames(docs, frame_size=0).cache())
    a = from_scored(filter_frames(idx, should=["apple"]))
    b = from_scored(filter_frames(idx, should=["banana"]))
    assert sorted(r["doc_id"] for r in match_all(a, b).collect()) == [1, 3]
    assert sorted(r["doc_id"] for r in match_any(a, b).collect()) == [1, 2, 3]
    assert sorted(r["doc_id"] for r in exclude(a, b).collect()) == []
    assert sorted(r["doc_id"] for r in exclude(b, a).collect()) == [2]
    ranked = score_and_rank(match_any(boost(a, 2.0), b), limit=10).collect()
    assert len(ranked) == 3
    assert ranked[0]["score"] >= ranked[-1]["score"]
    # offset slicing
    page2 = score_and_rank(match_any(a, b), limit=2, start=1).collect()
    full = score_and_rank(match_any(a, b), limit=3).collect()
    assert page2 == full[1:3]


def test_metadata_filtering(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    frames = build_frames(
        docs, frame_size=0, metadata_cols=["lang", "n_chars"]
    ).cache()
    idx = MemoryIndex(frames)
    en = filter_frames(idx, should=["table"], metadata={"lang": {"=": "en"}})
    assert en.count() > 0
    # metadata partition invariant: per-lang counts sum to the total
    total = filter_frames(idx, should=["table"]).count()
    langs = [r["lang"] for r in frames.select("lang").distinct().collect()]
    parts = sum(
        filter_frames(idx, should=["table"], metadata={"lang": {"=": l}}).count()
        for l in langs
    )
    assert parts == total
    # 'in' ≡ union of equalities
    both = filter_frames(
        idx, should=["table"], metadata={"lang": {"in": ["en", "de"]}}
    ).count()
    assert both == sum(
        filter_frames(idx, should=["table"], metadata={"lang": {"=": l}}).count()
        for l in ("en", "de")
    )
    # metadata-only fast path
    assert filter_metadata(frames, {"lang": {"=": "en"}}).count() == \
        frames.where("lang = 'en'").count()
    frames.unpersist()


def test_build_index_and_resume(spark, tmp_path):
    src = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(src)
    frames = build_frames(docs, frame_size=0, metadata_cols=["lang"]).cache()
    path = str(tmp_path / "idx")
    idx = build_index(frames, path, num_buckets=8, checkpoint_groups=4, source=src)
    n_posts = idx.postings().count()
    assert n_posts == frames_to_postings(frames).count()
    assert idx.manifest["stats_done"]
    assert len(idx.manifest["completed_slices"]) == 4

    # doc ledger + stored-document pointer
    assert idx.docs().count() == docs.count()
    assert idx.stored_documents().count() == docs.count()

    # Search through the persisted index matches the in-memory engine.
    mem = MemoryIndex(frames)
    got = search(idx, k=5, should=["spark", "table"]).collect()
    want = search(mem, k=5, should=["spark", "table"]).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]

    # Simulate a crash after slice 1: remove later slices' lineage and
    # their parquet output, then resume.
    manifest = idx.manifest
    for g in ("2", "3"):
        lo = manifest["completed_slices"][g]["bucket_lo"]
        hi = manifest["completed_slices"][g]["bucket_hi"]
        del manifest["completed_slices"][g]
        for b in range(lo, hi):
            shutil.rmtree(
                os.path.join(path, "postings", f"term_bucket={b}"),
                ignore_errors=True,
            )
    manifest["stats_done"] = False
    import json

    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    # Resume with a DIFFERENT checkpoint_groups argument: the manifest's
    # slicing wins (completed_slices keys index the prior bounds — a
    # mismatched slicing would silently skip bucket ranges).
    idx2 = build_index(frames, path, num_buckets=8, checkpoint_groups=2)
    assert idx2.postings().count() == n_posts
    assert len(idx2.manifest["completed_slices"]) == 4

    # The compressed posting-list layout was rebuilt too (slice writes
    # are idempotent dynamic partition overwrites), and WAND BM25 over
    # it is rank-identical to the DataFrame engine (single-frame corpus,
    # so frame-level and doc-level BM25 coincide).
    from caterpillar_spark.query.wand import wand_topk

    got = wand_topk(idx2.compressed(), ["spark", "table"], k=5).collect()
    want = search(
        mem, k=5, unit="document", should=["spark", "table"], scorer="bm25"
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]
    frames.unpersist()


@needs_ref
def test_find_bi_gram_words_alice(spark):
    """Reference golden (test_index.py:364-383), REFERENCE-EXACT: alice
    @ frame_size=2, Default analyser → exactly 4 bigrams including
    'golden key'; raising the threshold is monotonically restrictive."""
    from caterpillar_spark.query.analytics import find_bi_gram_words

    with open(os.path.join(REF_RESOURCES, "alice.txt")) as f:
        text = f.read()
    frames = build_frames(
        spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
    ).cache()

    found = {r["bigram"] for r in find_bi_gram_words(frames).collect()}
    assert "golden key" in found
    assert len(found) == 4

    old_n = 10**6
    for threshold in (0.0, 20.0, 40.0, 60.0, 80.0):
        n = find_bi_gram_words(frames, threshold=threshold).count()
        assert n <= old_n
        old_n = n
    frames.unpersist()


@needs_ref
def test_find_bi_gram_words_moby(spark):
    """Reference golden (test_index.py:386-397), REFERENCE-EXACT:
    moby.txt discovers exactly 10 bigrams including 'ivory leg'."""
    from caterpillar_spark.query.analytics import find_bi_gram_words

    with open(os.path.join(REF_RESOURCES, "moby.txt")) as f:
        text = f.read()
    frames = build_frames(
        spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
    )
    found = {r["bigram"] for r in find_bi_gram_words(frames).collect()}
    assert "ivory leg" in found
    assert len(found) == 10


@needs_ref
def test_find_bi_gram_words_wikileaks(spark):
    """Reference golden (test_index.py:405-411), REFERENCE-EXACT:
    wikileaks-secret.txt discovers exactly 29 bigrams."""
    from caterpillar_spark.query.analytics import find_bi_gram_words

    with open(os.path.join(REF_RESOURCES, "wikileaks-secret.txt")) as f:
        text = f.read()
    frames = build_frames(
        spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
    )
    assert find_bi_gram_words(frames).count() == 29


@needs_ref
def test_frame_text_byte_identity_vs_stored_reference_index(spark):
    """input_hint per-row invariant against the reference's OWN stored
    output: the v0.10.0 fixture index carries the punkt-derived frame
    text for alice.txt.  Every frame must be byte-identical (the six
    punkt-specific boundary decisions are reproduced by the rules in
    analysis/sentence.py)."""
    import difflib
    import json
    import sqlite3

    con = sqlite3.connect(
        "file:" + os.path.join(REF_RESOURCES, "alice_indexed_v0_10_0/storage.db")
        + "?mode=ro",
        uri=True,
    )
    ref = [
        json.loads(r[0])["_text"]
        for r in con.execute("SELECT stored FROM frame ORDER BY id")
    ]
    with open(os.path.join(REF_RESOURCES, "alice.txt")) as f:
        text = f.read()
    frames = build_frames(
        spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
    )
    ours = [r["frame_text"] for r in frames.orderBy("frame_seq").collect()]

    sm = difflib.SequenceMatcher(a=ref, b=ours, autojunk=False)
    identical = sum(
        i2 - i1 for tag, i1, i2, _, _ in sm.get_opcodes() if tag == "equal"
    )
    assert len(ref) == 1153
    assert identical == 1153


@needs_ref
def test_term_vectors_identical_vs_stored_reference_postings(spark):
    """Deepest parity check: our per-frame term->frequency vectors
    must equal the reference's STORED postings (term_posting ⋈
    vocabulary in the v0.10.0 fixture) on every one of the 1153
    text-aligned frames."""
    import difflib
    import json
    import sqlite3

    con = sqlite3.connect(
        "file:" + os.path.join(REF_RESOURCES, "alice_indexed_v0_10_0/storage.db")
        + "?mode=ro",
        uri=True,
    )
    ref_frames = [
        (r[0], json.loads(r[1])["_text"])
        for r in con.execute("SELECT id, stored FROM frame ORDER BY id")
    ]
    vocab = dict(con.execute("SELECT id, term FROM vocabulary"))
    ref_post = {}
    for tid, fid, freq, _ in con.execute("SELECT * FROM term_posting"):
        ref_post.setdefault(fid, {})[vocab[tid]] = freq

    with open(os.path.join(REF_RESOURCES, "alice.txt")) as f:
        text = f.read()
    rows = (
        build_frames(
            spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
        )
        .orderBy("frame_seq")
        .collect()
    )
    ours = [
        (r["frame_text"], {t["term"]: t["freq"] for t in r["terms"]})
        for r in rows
    ]

    sm = difflib.SequenceMatcher(
        a=[t for _, t in ref_frames], b=[t for t, _ in ours], autojunk=False
    )
    tot = same = 0
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag != "equal":
            continue
        for off in range(i2 - i1):
            fid = ref_frames[i1 + off][0]
            tot += 1
            if ref_post.get(fid, {}) == ours[j1 + off][1]:
                same += 1
    assert tot == 1153
    assert same == 1153


def test_bm25_doc_matches_wand_on_multiframe_corpus(spark):
    """Pin the doc-unit BM25 semantics: scorer='bm25_doc' is numerically
    identical to block-max WAND on a corpus where most documents span
    multiple frames, while the frame-rollup scorer ('bm25' at
    unit='document') intentionally diverges there (the two coincide
    only on single-frame docs)."""
    from caterpillar_spark.query.wand import CompressedIndex, wand_topk
    from caterpillar_spark.sources import ingest_webtext, synthetic_webtext

    docs = ingest_webtext(synthetic_webtext(spark, 120, seed=9))
    frames = build_frames(docs, frame_size=2, metadata_cols=["lang"]).cache()
    per_doc = frames.groupBy("doc_id").count()
    assert per_doc.where("count > 1").count() > per_doc.count() / 2

    idx = MemoryIndex(frames)
    cidx = CompressedIndex.build(
        idx.postings(), num_buckets=8, block_bits=3, doc_lens=idx.doc_lens()
    )
    terms = ["the", "data"]
    got = search(idx, k=15, unit="document", should=terms, scorer="bm25_doc").collect()
    want = wand_topk(cidx, terms, k=15).collect()
    assert [(r["doc_id"], round(r["score"], 8)) for r in got] == [
        (r["doc_id"], round(r["score"], 8)) for r in want
    ]

    rolled = search(idx, k=15, unit="document", should=terms, scorer="bm25").collect()
    assert [(r["doc_id"], round(r["score"], 8)) for r in rolled] != [
        (r["doc_id"], round(r["score"], 8)) for r in got
    ]

    # frame unit rejects the document-granularity scorer
    with pytest.raises(ValueError, match="bm25_doc"):
        search(idx, k=5, unit="frame", should=terms, scorer="bm25_doc").collect()
    frames.unpersist()


def test_bm25_doc_matches_wand_on_multifield_corpus(spark):
    """bm25_doc ≡ WAND must hold on a MULTI-FIELD index too: df is a
    distinct-document count across fields, not the per-(term, field)
    docs_occuring sum (which counts a doc once per field containing the
    term — idf wrong, df can exceed N; the r2 bug found by the
    advisor).  Field-scoped doc mode restricts N/avgdl/dl to the scoped
    fields like frame mode does."""
    from caterpillar_spark.query.engine import _resolve_weights
    from caterpillar_spark.query.wand import CompressedIndex, wand_topk
    from pyspark.sql import Row

    import math

    docs = spark.createDataFrame(
        [
            Row(doc_id=i,
                title=f"data spark title {i} alpha beta",
                body=("spark data engine row " * (2 + i % 3)).strip())
            for i in range(1, 41)
        ]
    )
    frames = build_frames(docs, text_cols=["title", "body"], frame_size=2).cache()
    idx = MemoryIndex(frames)

    # 'spark' occurs in BOTH fields of every doc: summed docs_occuring
    # would be 80 > N=40; distinct-doc df must be 40.
    weights, n, _ = _resolve_weights(
        idx, [("spark", 0, "should")], None, None, "bm25_doc"
    )
    assert n == 40.0
    assert weights["spark"] == pytest.approx(
        math.log(1.0 + (40 - 40 + 0.5) / (40 + 0.5))
    )

    cidx = CompressedIndex.build(
        idx.postings(), num_buckets=4, block_bits=3, doc_lens=idx.doc_lens()
    )
    terms = ["spark", "alpha"]
    got = search(
        idx, k=40, unit="document", should=terms, scorer="bm25_doc"
    ).collect()
    want = wand_topk(cidx, terms, k=40).collect()
    assert [(r["doc_id"], round(r["score"], 8)) for r in got] == [
        (r["doc_id"], round(r["score"], 8)) for r in want
    ]

    # field-scoped doc mode: N/avgdl/df come from the scoped field only
    w_t, n_t, avgdl_t = _resolve_weights(
        idx, [("engine", 0, "should")], ["title"], None, "bm25_doc"
    )
    # 'engine' never occurs in titles: scoped df = 0 -> missing-term
    # weight 0 (reference sqlite.py:1340-1348), NOT the body-wide idf
    assert n_t == 40.0 and w_t["engine"] == 0.0
    title_avgdl = (
        frames.where(F.col("field") == "title")
        .groupBy("doc_id").agg(F.sum("frame_tokens").alias("dl"))
        .agg(F.avg("dl")).collect()[0][0]
    )
    assert avgdl_t == pytest.approx(title_avgdl)
    frames.unpersist()


def test_bm25_doc_multifield_on_persisted_index(spark, tmp_path):
    """The multi-field distinct-doc df path on a PERSISTED bucketed
    index: term-bucket pruning via the driver-side hash + the
    postings-derived scoped doc-lens fallback (no frames attribute on
    InvertedIndex) must give the same ranking as the in-memory index."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=i,
                title=f"data spark title {i} alpha beta",
                body=("spark data engine row " * (2 + i % 3)).strip())
            for i in range(1, 31)
        ]
    )
    frames = build_frames(docs, text_cols=["title", "body"], frame_size=2).cache()
    mem = MemoryIndex(frames)
    stored = build_index(frames, str(tmp_path / "mf_idx"), num_buckets=4)

    terms = ["spark", "alpha"]
    want = [
        (r["doc_id"], round(r["score"], 8))
        for r in search(
            mem, k=30, unit="document", should=terms, scorer="bm25_doc"
        ).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 8))
        for r in search(
            stored, k=30, unit="document", should=terms, scorer="bm25_doc"
        ).collect()
    ]
    assert got == want

    # field-scoped doc mode on the persisted index exercises the
    # postings-derived doc-lens fallback (dl = title tokens only)
    scoped = [
        (r["doc_id"], round(r["score"], 8))
        for r in search(
            stored, k=30, unit="document", should=["alpha"],
            scorer="bm25_doc", include_fields=["title"],
        ).collect()
    ]
    scoped_mem = [
        (r["doc_id"], round(r["score"], 8))
        for r in search(
            mem, k=30, unit="document", should=["alpha"],
            scorer="bm25_doc", include_fields=["title"],
        ).collect()
    ]
    assert scoped == scoped_mem
    frames.unpersist()


@needs_ref
def test_employee_survey_bigram_goldens(spark):
    """Reference goldens (test_index.py:422-433), REFERENCE-EXACT on the
    government-employee-survey corpus: find_bi_gram_words discovers 7
    bigrams; detect_significant_ngrams(min_count=5, threshold=40) with
    the reference's strict comparisons and 63-bit position cap yields
    exactly 16 pairs including ('pay', 'rise')."""
    from caterpillar_spark.query.analytics import (
        find_bi_gram_words,
        significant_bigrams,
    )

    with open(
        os.path.join(REF_RESOURCES, "government-emplyee-survey-PC.txt")
    ) as f:
        text = f.read()
    frames = build_frames(
        spark.createDataFrame([Row(doc_id=1, text=text)]), frame_size=2
    ).cache()
    assert find_bi_gram_words(frames).count() == 7

    sig = significant_bigrams(
        frames_to_postings(frames), min_count=5, threshold=40, position_cap=62
    ).collect()
    names = {(r["term_a"], r["term_b"]) for r in sig}
    assert len(names) == 16
    assert ("pay", "rise") in names
    frames.unpersist()


@needs_ref
def test_moby_small_goldens(spark):
    """Reference goldens (test_index.py:350-361), REFERENCE-EXACT:
    moby_small with the test analyser has a 38-term vocabulary and one
    posting each for the compound name 'Mr. Chace' and the all-caps
    'CONVERSATIONS'."""
    with open(os.path.join(REF_RESOURCES, "moby_small.txt")) as f:
        text = f.read()
    posts = frames_to_postings(
        build_frames(
            spark.createDataFrame([Row(doc_id=1, text=text)]),
            analyser=TestAnalyser(), frame_size=2,
        )
    ).cache()
    assert posts.select("term").distinct().count() == 38
    assert posts.where(F.col("term") == "Mr. Chace").count() == 1
    assert posts.where(F.col("term") == "CONVERSATIONS").count() == 1
    posts.unpersist()


@needs_ref
def test_mt_warning_number_tokens(spark):
    """Reference goldens (test_index_search.py:543-556),
    REFERENCE-EXACT: decimal/comma numbers tokenize whole — '1770' in 2
    frames, '1,900' and '4.4' in 1 each."""
    with open(os.path.join(REF_RESOURCES, "mt_warning_utf8.txt")) as f:
        text = f.read()
    idx = MemoryIndex(
        build_frames(
            spark.createDataFrame([Row(doc_id=1, text=text)]),
            analyser=TestAnalyser(), frame_size=2,
        ).cache()
    )
    assert filter_frames(idx, should=["1770"]).count() == 2
    assert filter_frames(idx, should=["1,900"]).count() == 1
    assert filter_frames(idx, should=["4.4"]).count() == 1
    idx.frames.unpersist()


@needs_ref
def test_twitter_handles_and_metadata(spark):
    """Reference goldens (test_index_search.py:558-578),
    REFERENCE-EXACT: '@'-handles and emails survive tokenization whole;
    the sentiment metadata partition covers every frame."""
    import csv as _csv

    with open(os.path.join(REF_RESOURCES, "twitter_sentiment.csv")) as f:
        rows = list(_csv.reader(f))[1:]
    docs = spark.createDataFrame(
        [Row(doc_id=i, sentiment=r[0], text=r[1]) for i, r in enumerate(rows)]
    )
    frames = build_frames(
        docs, analyser=TestAnalyser(), frame_size=2,
        metadata_cols=["sentiment"],
    ).cache()
    idx = MemoryIndex(frames)
    assert filter_frames(idx, should=["@NYSenate"]).count() == 1
    assert filter_frames(idx, should=["summerdays@gmail.com"]).count() == 1
    pos = filter_metadata(frames, {"sentiment": {"=": "positive"}}).count()
    neg = filter_metadata(frames, {"sentiment": {"=": "negative"}}).count()
    assert pos + neg == frames.count()
    frames.unpersist()


@needs_ref
def test_multifield_boolean_invariants(spark):
    """Reference multi-field query-algebra invariants
    (test_index_search.py:238-316): boolean counts compose over a
    two-TEXT-field index; frame identity is per-(doc, field), so the
    same query over the two fields intersects empty; unknown scoped
    fields are rejected with the schema present."""
    from caterpillar_spark.query.composition import from_scored
    from caterpillar_spark.schema import Schema, TEXT, UnknownFieldError

    with open(os.path.join(REF_RESOURCES, "alice.txt")) as f:
        text = f.read()
    docs = spark.createDataFrame([Row(doc_id=1, text1=text, text2=text)])
    frames = build_frames(
        docs, text_cols=["text1", "text2"], analyser=TestAnalyser(),
        frame_size=2,
    ).cache()
    idx = MemoryIndex(frames)
    f1 = {"include_fields": ["text1"]}

    alice = filter_frames(idx, must=["Alice"], **f1).count()
    king = filter_frames(idx, must=["King"], **f1).count()
    assert alice > 0 and king > 0
    both = filter_frames(idx, must=["King", "Alice"], **f1).count()
    either = filter_frames(idx, should=["King", "Alice"], **f1).count()
    a_not_k = filter_frames(idx, must=["Alice"], must_not=["King"], **f1).count()
    k_not_a = filter_frames(idx, must=["King"], must_not=["Alice"], **f1).count()
    assert a_not_k == alice - both
    assert k_not_a == king - both
    assert either == a_not_k + k_not_a + both

    # at_least_n relations (missing terms contribute nothing)
    assert filter_frames(idx, at_least_n=(2, ["King", "Alice"]), **f1).count() == both
    assert filter_frames(
        idx, at_least_n=(2, ["King", "Alice", "zzzznope"]), **f1
    ).count() == both
    assert filter_frames(idx, at_least_n=(1, ["King", "Alice"]), **f1).count() == either

    # same content in both fields: per-field counts double field-scoped ones
    assert filter_frames(idx, must=["King", "Alice"]).count() == 2 * both

    # frame identity is (doc, field, frame_seq): the two fields' result
    # sets are disjoint, their union is the unscoped result
    r1 = from_scored(filter_frames(idx, must=["King", "Alice"], include_fields=["text1"]))
    r2 = from_scored(filter_frames(idx, must=["King", "Alice"], include_fields=["text2"]))
    from caterpillar_spark.query import match_all, match_any

    assert match_all(r1, r2).count() == 0
    assert match_any(r1, r2).count() == 2 * both

    # unknown scoped field rejected when a schema is declared
    sch = Schema(text1=TEXT, text2=TEXT)
    with pytest.raises(UnknownFieldError):
        filter_frames(idx, must=["Alice"], include_fields=["nope"], schema=sch)

    # document retrieval: one document holds everything
    assert filter_frames(idx, must=["Alice"], unit="document", **f1).count() == 1
    frames.unpersist()


@needs_ref
def test_nps_csv_schema_search_goldens(spark):
    """Reference goldens over big.csv (test_index_search.py:22-120),
    a 7-field declared schema (3 TEXT + categorical + numeric),
    schema-normalized ingest, field-scoped term search and
    metadata-only filtering.  Empty TEXT values produce no frames (the
    dannevirke golden pins that), and punkt splits non-abbreviation
    periods even before lowercase continuations (the Otago golden pins
    that)."""
    import csv as _csv

    from caterpillar_spark.schema import (
        CATEGORICAL_TEXT,
        NUMERIC,
        Schema,
        TEXT,
        normalize_metadata_columns,
    )

    with open(
        os.path.join(REF_RESOURCES, "big.csv"), encoding="utf-8", errors="replace"
    ) as f:
        rows = list(_csv.reader(f))[1:]
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, respondant=r[0], region=r[1], store=r[2],
                liked=r[3], disliked=r[4], would_like=r[5], nps=r[6])
            for i, r in enumerate(rows)
        ]
    )
    sch = Schema(
        liked=TEXT(), disliked=TEXT(), would_like=TEXT(),
        region=CATEGORICAL_TEXT(indexed=True),
        store=CATEGORICAL_TEXT(indexed=True),
        nps=NUMERIC(indexed=True), respondant=NUMERIC(),
    )
    docs = normalize_metadata_columns(docs, sch)
    frames = build_frames(
        docs, text_cols=["liked", "disliked", "would_like"],
        analyser=TestAnalyser(), frame_size=2,
        metadata_cols=["region", "store", "nps"],
    ).cache()
    idx = MemoryIndex(frames)

    assert filter_frames(
        idx, should=["point", "pointed", "points"], include_fields=["would_like"]
    ).count() == 14

    otago = {"region": {"=": "Otago"}, "nps": {"<": 5}}
    hits = filter_metadata(frames, otago, schema=sch).cache()
    assert hits.count() == 15  # REFERENCE-EXACT
    assert hits.select("doc_id").distinct().count() == 5
    assert sum(
        hits.where(F.col("field") == f).count()
        for f in ("liked", "disliked", "would_like")
    ) == 15

    dann = {"nps": {"=": 10}, "store": {"=": "DANNEVIRKE"}}
    d = filter_metadata(frames, dann, schema=sch)
    assert d.count() == 6 == sum(
        d.where(F.col("field") == f).count()
        for f in ("liked", "disliked", "would_like")
    )

    chch_all = filter_metadata(
        frames, {"region": {"=": "Christchurch"}}, schema=sch
    ).where(F.col("field") == "liked").count()
    chch_pos = filter_metadata(
        frames, {"region": {"=": "Christchurch"}, "nps": {">": 0}}, schema=sch
    ).where(F.col("field") == "liked").count()
    assert chch_pos < chch_all

    # nps range partition: >=i and <i cover exactly the non-null >0 base
    total = filter_metadata(frames, {"nps": {">": 0}}, schema=sch).count()
    for i in (1, 5, 10):
        assert (
            filter_metadata(frames, {"nps": {">=": i}}, schema=sch).count()
            + filter_metadata(frames, {"nps": {"<": i}}, schema=sch).count()
            == total
        )
    hits.unpersist()
    frames.unpersist()


def test_reader_query_advanced_metadata_composition(spark):
    """Reference advanced metadata/composition invariants
    (test_index_search.py:317-381), REFERENCE-EXACT counts: numeric and
    categorical metadata scoped per field and across fields, composed
    with exclude; the metadata inversion agrees with the scoped counts;
    non-indexed fields are rejected."""
    from caterpillar_spark.query.vectors import metadata_inversion
    from caterpillar_spark.schema import (
        CATEGORICAL_TEXT,
        NUMERIC,
        NonIndexedFieldError,
        Schema,
        TEXT,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, liked="product", disliked="service", age=20,
                gender="male", non_indexed="x"),
            Row(doc_id=2, liked="service", disliked="product", age=30,
                gender="male", non_indexed="x"),
            Row(doc_id=3, liked="service", disliked="price", age=40,
                gender="female", non_indexed="x"),
            Row(doc_id=4, liked="product", disliked="product", age=80,
                gender="female", non_indexed="x"),
        ]
    )
    sch = Schema(
        liked=TEXT, disliked=TEXT, age=NUMERIC(indexed=True),
        gender=CATEGORICAL_TEXT(indexed=True),
        non_indexed=CATEGORICAL_TEXT(indexed=False),
    )
    frames = build_frames(
        docs, text_cols=["liked", "disliked"], frame_size=2,
        metadata_cols=["age", "gender"],
    ).cache()
    idx = MemoryIndex(frames)

    def meta_n(metadata, field=None):
        out = filter_metadata(frames, metadata, schema=sch)
        if field:
            out = out.where(F.col("field") == field)
        return out.count()

    def rs(df):
        return from_scored(
            df.select("doc_id", "field", "frame_seq", F.lit(0.0).alias("score"))
        )

    for fld in ("liked", "disliked"):
        assert meta_n({"age": {"=": 80}}, fld) == 1
        assert meta_n({"age": {"<": 80}}, fld) == 3
        assert meta_n({"age": {">=": 20}}, fld) == 4
        assert filter_frames(
            idx, must=["product"], metadata={"gender": {"=": "female"}},
            include_fields=[fld], schema=sch,
        ).count() == 1
        product = rs(
            filter_frames(idx, must=["product"], include_fields=[fld])
            .select("doc_id", "field", "frame_seq",
                    F.lit(0.0).alias("score"))
        )
        male = rs(filter_metadata(frames, {"gender": {"=": "male"}}, schema=sch)
                  .where(F.col("field") == fld))
        both = rs(filter_metadata(
            frames, {"gender": {"in": ("female", "male")}}, schema=sch
        ).where(F.col("field") == fld))
        assert exclude(product, male).count() == 1
        assert exclude(product, both).count() == 0

    # both fields
    assert meta_n({"age": {"=": 80}}) == 2
    assert meta_n({"age": {"<": 80}}) == 6
    assert meta_n({"age": {">=": 20}}) == 8
    assert filter_frames(
        idx, must=["product"], metadata={"gender": {"=": "female"}}, schema=sch
    ).count() == 2
    product = rs(
        filter_frames(idx, must=["product"])
        .select("doc_id", "field", "frame_seq", F.lit(0.0).alias("score"))
    )
    male = rs(filter_metadata(frames, {"gender": {"=": "male"}}, schema=sch))
    both = rs(filter_metadata(
        frames, {"gender": {"in": ("female", "male")}}, schema=sch
    ))
    assert product.count() == 4
    assert exclude(product, male).count() == 2
    assert exclude(product, both).count() == 0

    # metadata inversion agrees with the scoped result (get_metadata)
    inv = {
        (r["field"], r["value"]): r["n"]
        for r in metadata_inversion(frames, ["gender"], unit="frame").collect()
    }
    assert inv[("gender", "male")] == male.count()

    with pytest.raises(NonIndexedFieldError):
        filter_metadata(frames, {"non_indexed": {"=": "x"}}, schema=sch)
    frames.unpersist()
