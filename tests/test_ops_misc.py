"""Unit coverage for corpus ops, DateTime tokenization, case-fold
suggestions, and custom analyser stacks (items the driver oracles cover
only end-to-end)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from caterpillar_spark.analysis.analyser import Analyser
from caterpillar_spark.analysis.tokenize import DateTimeTokenizer, RegexpTokenizer
from caterpillar_spark.analysis.filters import LowercaseFilter


def test_datetime_tokenizer_iso_utc():
    t = DateTimeTokenizer()
    assert next(t.tokenize("2024-03-01T10:30:00Z")).value == "2024-03-01T10:30:00+00:00"
    assert next(t.tokenize("2024-03-01 10:30:00+02:00")).value == "2024-03-01T08:30:00+00:00"
    # naive treated as UTC
    assert next(t.tokenize("2024-03-01T10:30:00")).value == "2024-03-01T10:30:00+00:00"


def test_datetime_tokenizer_formats_and_ignore_tz():
    t = DateTimeTokenizer(datetime_formats=["%d/%m/%Y %H:%M"], ignore_tz=True)
    assert next(t.tokenize("01/03/2024 10:30")).value == "2024-03-01T10:30:00"
    with pytest.raises(ValueError):
        next(t.tokenize("not a date"))


def test_case_fold_terms(spark):
    from caterpillar_spark.framing import build_frames, frames_to_postings
    from caterpillar_spark.query.analytics import case_fold_terms

    rows = (
        [(i, "fresh apple tart") for i in range(15)]
        + [(100 + i, "fresh Apple pie") for i in range(5)]  # mid-sentence
        + [(200 + i, "eat APPLE cart") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    posts = frames_to_postings(build_frames(docs, frame_size=0))
    out = {r["variant"]: r["fold_to"] for r in case_fold_terms(posts).collect()}
    # 'apple' dominates (15 frames); rarer casings fold into it
    assert out.get("Apple") == "apple"
    assert out.get("APPLE") == "apple"


def test_custom_analyser_stack():
    """SURVEY §2.10: user-supplied tokenizer+filter pipelines."""

    class ShoutAnalyser(Analyser):
        def get_tokenizer(self):
            return RegexpTokenizer(r"\w+")

        def get_filters(self):
            return [LowercaseFilter()]

    toks = [t.value for t in ShoutAnalyser().analyse("FOO Bar baz")]
    assert toks == ["foo", "bar", "baz"]


def test_simhash_close_for_similar_docs(spark):
    from caterpillar_spark.ops import simhash

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy cat again and again"),
         (3, "completely unrelated text about spark partitions and shuffles")],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    d12 = bin(h[1] ^ h[2]).count("1")
    d13 = bin(h[1] ^ h[3]).count("1")
    assert d12 < d13


def test_cosine_topk_matches_numpy(spark):
    from caterpillar_spark.ops import cosine_topk

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = vecs[0]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, [float(x) for x in q], k=5).collect()]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = sorted(range(30), key=lambda i: (-sims[i], i))[:5]
    assert [d for d, _ in got] == want
    for (d, c) in got:
        assert math.isclose(c, float(sims[d]), rel_tol=1e-5, abs_tol=1e-5)


def test_ann_topk_subset_of_bruteforce_space(spark):
    from caterpillar_spark.ops import ann_topk

    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    got = ann_topk(emb, [float(x) for x in vecs[3]], k=5, num_planes=4).collect()
    assert 0 < len(got) <= 5
    # the query's own bucket always contains the query vector itself
    assert got[0]["vec_id"] == 3


def test_ann_ivf_topk_exact_within_probed_cells(spark):
    """IVF results are exactly the brute-force top-k restricted to the
    nprobe probed cells; nprobe=n_centroids degenerates to the exact
    brute-force ranking; assignment matches the naive argmax."""
    from caterpillar_spark.ops import (
        ann_ivf_topk,
        cosine_topk,
        ivf_assign_col,
        ivf_centroids,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(80, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]

    # nprobe = n_centroids scans everything -> identical to brute force
    full = ann_ivf_topk(emb, q, k=10, n_centroids=4, nprobe=4).collect()
    exact = cosine_topk(emb, q, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]

    # nprobe < n_centroids: results == brute force over the probed cells
    cents = ivf_centroids(emb, 4)
    assigned = {
        r["vec_id"]: r["cid"]
        for r in emb.select(
            "vec_id", ivf_assign_col("embedding", cents).alias("cid")
        ).collect()
    }
    # naive argmax assignment agrees
    import numpy.linalg as la

    for i in (0, 17, 42):
        sims = [
            (-(vecs[i] @ np.array(cv, dtype="float64"))
             / (la.norm(vecs[i].astype("float64")) * la.norm(cv)), cid)
            for cid, cv in cents
        ]
        assert assigned[i] == min(sims)[1]

    got = ann_ivf_topk(emb, q, k=10, n_centroids=4, nprobe=2).collect()
    probed = {
        cid
        for cid, _ in sorted(
            (
                (c[0], c[1])
                for c in cents
            ),
            key=lambda e: (
                -(np.array(e[1]) @ np.array(q))
                / (la.norm(e[1]) * la.norm(q)),
                e[0],
            ),
        )[:2]
    }
    in_cells = [i for i in range(80) if assigned[i] in probed]
    sims = {
        i: float(np.array(q) @ vecs[i].astype("float64"))
        / (la.norm(q) * float(la.norm(vecs[i].astype("float64"))))
        for i in in_cells
    }
    want = sorted(in_cells, key=lambda i: (-round(sims[i], 6), i))[:10]
    assert [r["vec_id"] for r in got] == want
    # own cell is always probed -> the query vector itself is returned
    assert got[0]["vec_id"] == 0


def test_quality_scores_ranges(spark):
    from caterpillar_spark.ops import quality_scores

    docs = spark.createDataFrame(
        [(1, "the the the the the"), (2, "Diverse words here now")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert rows[1]["repetition"] > rows[2]["repetition"]
    for r in rows.values():
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0


def test_embedding_lsh_candidates_find_near_dups(spark):
    from caterpillar_spark.ops import embedding_lsh_candidates, embedding_near_dups

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float64")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # planted near-duplicates: tiny perturbations of vectors 0..4
    for j in range(5):
        rows.append((100 + j, [float(x + 0.001) for x in base[j]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cands = embedding_lsh_candidates(emb, num_planes=8, probe_hamming=1)
    found = embedding_near_dups(emb, threshold=0.999, candidates=cands)
    got = {(r["id_a"], r["id_b"]) for r in found.collect()}
    # every planted pair lands in the same bucket (identical signs)
    assert {(j, 100 + j) for j in range(5)} <= got

    # bucketed result is a subset of brute force at the same threshold
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.999).collect()
    }
    assert got <= brute


def test_near_dup_clusters(spark):
    """Connected components over a pair graph: chains merge into one
    cluster labeled by the minimum id; disjoint components stay apart;
    isolated docs (no pairs) don't appear."""
    from caterpillar_spark.ops import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> component {1,2,3,4}
         (10, 11),                    # pair
         (20, 22), (21, 22)],         # star -> {20,21,22}
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}

    # order of endpoints must not matter
    flipped = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], "id_a long, id_b long"
    )
    got2 = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(flipped).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 1, 4: 1}


def test_near_dup_clusters_warns_on_non_convergence(spark):
    """Hitting max_iterations with labels still changing must be
    audible (a silently split component means dedup keeps extra
    survivors)."""
    import pytest as _pytest

    from caterpillar_spark.ops import near_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
    )
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(chain, max_iterations=1).collect()
        }
    assert got[9] != 1  # the far end genuinely hasn't received label 1
    # and with enough rounds the same graph converges silently
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        full = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(chain).collect()
        }
    assert set(full.values()) == {1}


def test_bpe_token_stats_pretokens(spark):
    """GPT-2-style pre-tokenizer counts on text with contractions,
    symbols and digits (branches the plain driver corpus never hits)."""
    from caterpillar_spark.ops import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "I don't like spam!!! 123 times")], "doc_id long, text string"
    )
    r = bpe_token_stats(docs).collect()[0]
    # I | " don" | 't | " like" | " spam" | "!!!" | " 123" | " times"
    assert r["bpe_tokens"] == 8
    assert r["ws_tokens"] == 7  # i don t like spam 123 times
    assert r["chars_per_bpe"] == round(len("I don't like spam!!! 123 times") / 8, 6)


def test_gopher_quality_flags(spark):
    from caterpillar_spark.ops import gopher_quality_flags

    docs = spark.createDataFrame(
        [
            (1, "too short"),
            (2, ("the quick brown fox jumps over the lazy dog and runs with "
                 "great speed into the forest while birds sing ") * 5),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in gopher_quality_flags(docs).collect()}
    assert r[1]["ok_word_count"] is False and r[1]["passes"] is False
    assert r[2]["ok_word_count"] is True
    assert r[2]["ok_alpha_words"] is True
    assert r[2]["ok_stopwords"] is True
    assert r[2]["passes"] == (
        r[2]["ok_word_count"] and r[2]["ok_mean_word_len"]
        and r[2]["ok_alpha_words"] and r[2]["ok_stopwords"]
    )


def test_ann_multi_table_recall(spark):
    """Multi-table LSH lifts recall over a single table; the graded
    config (8 tables x 8 planes, 1-bit probes) clears recall@10 >= 0.4
    even on this pessimal corpus (i.i.d. random embeddings - neighbors
    barely closer than strangers; real near-dup corpora sit far
    higher)."""
    from caterpillar_spark.ops import ann_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    single, multi = [], []
    for qid in (0, 3, 7):
        qvec = emb.where(F.col("vec_id") == qid).select("embedding").first()[0]
        exact = {r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()}
        a1 = {r["vec_id"] for r in ann_topk(emb, qvec, k=10, num_tables=1).collect()}
        a8 = {r["vec_id"] for r in ann_topk(emb, qvec, k=10, num_tables=8).collect()}
        single.append(len(exact & a1) / 10)
        multi.append(len(exact & a8) / 10)
    assert sum(multi) / 3 >= 0.4
    assert sum(multi) > sum(single)
    emb.unpersist()


def test_corpus_keyness_dunning_g2(spark):
    """Hand-computed Dunning log-likelihood on a 2-corpus toy:
    A = 'x x y', B = 'x z z z' (ta=3, tb=4)."""
    import math

    from caterpillar_spark.ops import corpus_keyness

    a = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x z z z")], "doc_id long, text string")
    out = {
        r["term"]: r
        for r in corpus_keyness(a, b, min_count=1).collect()
    }
    assert set(out) == {"x", "y", "z"}
    assert (out["x"]["count_a"], out["x"]["count_b"]) == (2, 1)

    def g2(ca, cb, ta=3.0, tb=4.0):
        tot = ta + tb
        s = 0.0
        if ca:
            s += ca * math.log(ca / (ta * (ca + cb) / tot))
        if cb:
            s += cb * math.log(cb / (tb * (ca + cb) / tot))
        return 2 * s

    assert out["x"]["g2"] == pytest.approx(g2(2, 1), abs=1e-5)
    assert out["y"]["g2"] == pytest.approx(g2(1, 0), abs=1e-5)
    assert out["z"]["g2"] == pytest.approx(g2(0, 3), abs=1e-5)
    # x at rate 2/3 in A vs 1/4 in B; y only in A; z only in B
    assert out["x"]["overused_in"] == "a"
    assert out["y"]["overused_in"] == "a"
    assert out["z"]["overused_in"] == "b"
    # min_count filters the combined count
    few = corpus_keyness(a, b, min_count=4).collect()
    assert {r["term"] for r in few} == set()


def test_dedup_lines_boilerplate(spark):
    """Corpus-wide line dedup: 'b' appears in 3 distinct docs (>= 2),
    so it is boilerplate; within-doc repetition alone does not qualify
    (distinct-document counting)."""
    from caterpillar_spark.ops import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "a. b. c"),
            (2, "x. b. y"),
            (3, "b. z"),
            (4, "q. q"),     # within-doc repeat only: q in ONE doc
            (5, "b"),        # all-boilerplate doc -> empty text
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in dedup_lines(docs, min_repeat=2, sep=". ").collect()
    }
    assert out[1] == ("a. c", 3, 1)
    assert out[2] == ("x. y", 3, 1)
    assert out[3] == ("z", 2, 1)
    assert out[4] == ("q. q", 2, 0)   # q kept: only 1 distinct doc
    assert out[5] == ("", 1, 1)
    # raising the threshold above b's 4 distinct docs keeps everything
    kept = dedup_lines(docs, min_repeat=5, sep=". ")
    assert kept.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_pii_scan_counts_and_redaction(spark):
    from caterpillar_spark.ops import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "write to jane.doe+x@mail.example.org or bob@ex.io"),
            (2, "call 555-123-4567 from 10.0.0.1 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_pii"]) == (2, 2)
    assert out[1]["text"] == "write to [EMAIL] or [EMAIL]"
    assert (out[2]["n_phone"], out[2]["n_ipv4"], out[2]["n_pii"]) == (1, 1, 2)
    assert out[2]["text"] == "call [PHONE] from [IPV4] today"
    assert out[3]["n_pii"] == 0 and out[3]["text"] == "nothing sensitive here"
    # no redaction: counts only, original text untouched
    cols = pii_scan(docs, redact=False).columns
    assert "text" not in cols and "n_pii" in cols
