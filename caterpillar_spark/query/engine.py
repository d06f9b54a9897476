"""Boolean retrieval + scoring over the inverted index.

Semantics spec: reference ``IndexReader.filter`` / ``filter_and_rank``
(processing/index.py:1157-1328) and the generated SQL in
``rank_or_filter_unstructured`` (storage/sqlite.py:1201-1474):

* ``must``      — every term group present (count of distinct matched
                  must-groups == number of must groups);
* ``should``    — contributes matches/score; a frame qualifies by
                  containing any positive query term;
* ``at_least_n``— ``(n, [terms])``: at least n distinct terms of the
                  list present;
* ``must_not``  — frames containing the term are excluded; requires at
                  least one positive term (like the reference,
                  sqlite.py:1279-1284);
* term variants — a tuple of terms acts as one logical term (same
                  group id), reference index.py:1211-1217.

Scoring:

* ``tfidf`` — the reference formula (sqlite.py:1321-1348):
  ``idf = 1 + ln(n_frames / (frame_freq + 1))``, frame score =
  ``sum(freq_in_frame * idf)`` over matched, non-excluded query terms.
  DEVIATION (documented): the reference runs on Python 2 where the
  division is *integer* division; we use true division.  Ranking order
  is unaffected for single-term queries and differs only in rare
  near-tie multi-term cases.
* ``bm25`` — Okapi BM25 (k1=1.2, b=0.75 defaults):
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``score = sum(idf * f*(k1+1) / (f + k1*(1 - b + b*dl/avgdl)))`` with
  dl = frame token count, avgdl from field statistics.  This is the
  engine's headline scorer per the build target.
* ``bm25_doc`` — document-granularity BM25: tf summed over the doc's
  frames before saturation, dl = doc token count, idf over document
  frequencies — numerically identical to the WAND engine
  (query/wand.py).  NOTE the semantics fork at unit='document':
  ``scorer='bm25'`` sums *frame-level* BM25 scores per document (the
  reference's frame-rollup), ``scorer='bm25_doc'`` is true doc-level
  BM25; they coincide exactly on single-frame documents
  (tests/test_index_query.py pins both relations on a multi-frame
  corpus).

Execution shape (Spark-first):

1. the query's term list is resolved against ``term_stats`` — a
   partition-pruned parquet read of only the buckets the query terms
   hash into — and weights are computed driver-side (the analog of the
   reference's precomputed ``term_search_driver`` temp table);
2. the tiny weighted-terms relation is **broadcast-joined** into the
   postings scan, itself pruned to the same term buckets and filtered
   by field scoping / metadata predicates on denormalized columns;
3. one partial-aggregated ``groupBy`` per retrieval unit (frame or
   document) computes score and the boolean HAVING counters;
4. top-k runs as ``orderBy(...).limit(k)`` which Catalyst executes as
   per-partition top-k + single merge (TakeOrderedAndProject) — no full
   sort at scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, functions as F

from caterpillar_spark.framing import frames_to_postings
from caterpillar_spark.indexing.build import (
    field_statistics,
    term_statistics,
)

TermSpec = Union[str, Tuple[str, ...]]

BM25_K1 = 1.2
BM25_B = 0.75


@dataclass
class MemoryIndex:
    """Index views computed on the fly from a frames DataFrame (no
    persisted layout; used by tests and small interactive jobs)."""

    frames: DataFrame

    def postings(self) -> DataFrame:
        return frames_to_postings(self.frames)

    def term_stats(self) -> DataFrame:
        return term_statistics(self.postings())

    def field_stats(self) -> DataFrame:
        return field_statistics(self.frames)

    def doc_lens(self) -> DataFrame:
        """(doc_id, dl): document length = sum of its frames' token
        counts (stop-advanced positions included — the dl the persisted
        docs ledger and WAND block bounds use)."""
        return self.frames.groupBy("doc_id").agg(
            F.sum("frame_tokens").cast("long").alias("dl")
        )

    def num_buckets(self) -> Optional[int]:
        return None


def _groups(
    must: Sequence[TermSpec],
    should: Sequence[TermSpec],
    at_least_n: Optional[Tuple[int, Sequence[TermSpec]]],
    must_not: Sequence[TermSpec],
):
    """Flatten term specs to (term, group_id, kind) rows; variants in a
    tuple share a group id."""
    rows: List[Tuple[str, int, str]] = []
    gid = 0
    for kind, specs in (("must", must), ("should", should)):
        for spec in specs:
            variants = (spec,) if isinstance(spec, str) else tuple(spec)
            rows.extend((v, gid, kind) for v in variants)
            gid += 1
    if at_least_n:
        for spec in at_least_n[1]:
            variants = (spec,) if isinstance(spec, str) else tuple(spec)
            rows.extend((v, gid, "nmin") for v in variants)
            gid += 1
    for spec in must_not:
        variants = (spec,) if isinstance(spec, str) else tuple(spec)
        rows.extend((v, gid, "exclude") for v in variants)
        gid += 1
    return rows


def _handle_cache(index, attr: str) -> dict:
    """Memoization store scoped to (index handle, cache epoch).

    ``cache_epoch()`` (InvertedIndex: the manifest revision, one cheap
    local JSON read per query) moves when the on-disk index changes —
    ``append_batch`` / ``delete_documents`` bump the revision — so a
    handle retained across an append drops its stale term statistics
    and corpus constants instead of scoring new postings with old df/N
    (the r3 advisory: missing terms were cached as None forever).
    Handles without an epoch (MemoryIndex, CompressedIndex over a
    pinned file listing) get a constant ``None`` epoch — the
    immutable-by-convention behavior, unchanged."""
    epoch = getattr(index, "cache_epoch", lambda: None)()
    store = getattr(index, attr, None)
    if store is None or store[0] != epoch:
        store = (epoch, {})
        try:
            object.__setattr__(index, attr, store)
        except (AttributeError, TypeError):
            pass
    return store[1]


def _field_scope(df: DataFrame, include_fields, exclude_fields) -> DataFrame:
    if include_fields:
        return df.where(F.col("field").isin(list(include_fields)))
    if exclude_fields:
        return df.where(~F.col("field").isin(list(exclude_fields)))
    return df


_OPS = {
    "=": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(list(v)),
    # reference wildcard equality is re.match — anchored at the start
    # of the value (schema.py:200-201); compiled to an anchored RLIKE.
    "*=": lambda c, v: c.rlike(f"^(?:{v})"),
}


def metadata_predicate(
    metadata: Dict[str, Dict[str, object]], schema=None
) -> Column:
    """Conjunctive document-metadata predicate over denormalized columns
    (reference _validate_analyse_metadata op set, index.py:1382-1428).

    With a declared :class:`caterpillar_spark.schema.Schema`, the spec
    is validated against it first — unknown fields, non-indexed fields
    and type-unsupported operators raise typed errors, and query values
    are analysed (stripped / coerced / DATETIME-normalized) exactly
    like ingest values before comparison."""
    if schema is not None:
        from caterpillar_spark.schema import validate_metadata

        metadata = validate_metadata(schema, metadata)
    pred = F.lit(True)
    for field, conds in metadata.items():
        for op, value in conds.items():
            if op not in _OPS:
                raise ValueError(f"Unsupported metadata operator {op!r}")
            pred = pred & _OPS[op](F.col(field), value)
    return pred


def filter_metadata(frames: DataFrame, metadata, schema=None) -> DataFrame:
    """Metadata-only fast path (reference sqlite.py:1103-1198): no
    posting join at all, just a pruned frame scan."""
    return frames.where(metadata_predicate(metadata, schema=schema))


def _fields_in_scope(index, include_fields, exclude_fields) -> List[str]:
    """Distinct indexed fields after scoping (one tiny collect, memoized
    per (index handle, manifest revision) — field_stats has one row per
    field, or per (field, batch) on an incrementally-appended index)."""
    cache = _handle_cache(index, "_fields_cache")
    fields = cache.get("fields")
    if fields is None:
        fields = sorted(
            r["field"]
            for r in index.field_stats().select("field").distinct().collect()
        )
        cache["fields"] = fields
    if include_fields:
        return [f for f in fields if f in set(include_fields)]
    if exclude_fields:
        return [f for f in fields if f not in set(exclude_fields)]
    return list(fields)


def _scoped_doc_lens(index, include_fields, exclude_fields) -> DataFrame:
    """(doc_id, dl) with dl restricted to the scoped fields.  Unscoped:
    the index's own doc-lens relation (docs ledger / frames rollup).
    Scoped: recomputed from the frames relation when the handle exposes
    one, else from distinct posting frames (misses frames whose tokens
    were all stop-marked — same documented deviation as
    delete_documents' pseudo-frames)."""
    if not include_fields and not exclude_fields:
        return index.doc_lens()
    frames = getattr(index, "frames", None)
    if isinstance(frames, DataFrame):
        src = _field_scope(frames, include_fields, exclude_fields)
        return src.groupBy("doc_id").agg(
            F.sum("frame_tokens").cast("long").alias("dl")
        )
    src = _field_scope(index.postings(), include_fields, exclude_fields)
    return (
        src.select("doc_id", "field", "frame_seq", "frame_tokens")
        .dropDuplicates(["doc_id", "field", "frame_seq"])
        .groupBy("doc_id")
        .agg(F.sum("frame_tokens").cast("long").alias("dl"))
    )


def _pruned_postings(index, spark, terms: Sequence[str]) -> DataFrame:
    """Postings scan pruned to the query terms: term-bucket partition
    pruning (buckets computed driver-side, no Spark job) + a literal
    ``isin`` predicate that parquet row-group min/max stats use because
    files are term-sorted."""
    posts = index.postings()
    nb = index.num_buckets()
    if nb:
        from caterpillar_spark.functions.hashing import spark_xxhash64

        buckets = sorted({spark_xxhash64(t) % nb for t in terms})
        posts = posts.where(F.col("term_bucket").isin(buckets))
    return posts.where(F.col("term").isin(list(terms)))


def _resolve_weights(
    index,
    terms: List[Tuple[str, int, str]],
    include_fields,
    exclude_fields,
    scorer: str,
) -> Tuple[Dict[str, float], float, float]:
    """Driver-side weight resolution from pruned statistics reads.

    Returns ({term: weight}, N, avgdl) — N and the document frequency
    are *frame*-granular for the frame scorers (tfidf/bm25) and
    *document*-granular for ``bm25_doc`` (distinct-document df + the
    field-scoped doc-lens relation, exactly the statistics WAND scores
    with).  Missing terms get weight 0 (reference sqlite.py:1340-1348).

    Document-granularity df note: ``term_stats.docs_occuring`` is per
    (term, field), so summing it over a multi-field index counts a
    document once per field containing the term — df could exceed N.
    On a single-field scope the sum is exact and the pruned stats read
    stays the fast path; with >1 field in scope the df comes from a
    distinct-doc count over the bucket-pruned postings instead.
    """
    doc_mode = scorer == "bm25_doc"
    term_values = sorted({t for t, _, _ in terms})

    # Per-term frequency statistics are static index properties (the
    # reference loads term statistics into memory the same way — the
    # vocabulary-scan anecdote, index.py:1016-1018), so they memoize on
    # the index handle exactly like the corpus constants below: a warm
    # repeat query runs ZERO statistics jobs, only the retrieval job.
    # Missing terms cache as None so absent vocabulary is not re-probed.
    ff_scope = (
        tuple(include_fields) if include_fields else None,
        tuple(exclude_fields) if exclude_fields else None,
        doc_mode,
    )
    ff_cache = _handle_cache(index, "_term_ff_cache")
    lookup = [t for t in term_values if (ff_scope, t) not in ff_cache]
    if lookup:
        if doc_mode and len(
            _fields_in_scope(index, include_fields, exclude_fields)
        ) > 1:
            spark = index.frames.sparkSession if isinstance(index, MemoryIndex) else index.spark
            posts = _field_scope(
                _pruned_postings(index, spark, lookup),
                include_fields, exclude_fields,
            )
            rows = (
                posts.groupBy("term")
                .agg(F.countDistinct("doc_id").alias("ff"))
                .collect()
            )
        else:
            stats = _field_scope(index.term_stats(), include_fields, exclude_fields)
            stat_col = "docs_occuring" if doc_mode else "frames_occuring"
            rows = (
                stats.where(F.col("term").isin(lookup))
                .groupBy("term")
                .agg(F.sum(stat_col).alias("ff"))
                .collect()
            )
        found = {r["term"]: r["ff"] for r in rows}
        for t in lookup:
            ff_cache[(ff_scope, t)] = found.get(t)
    ff = {
        t: ff_cache[(ff_scope, t)]
        for t in term_values
        if ff_cache[(ff_scope, t)] is not None
    }

    # Corpus constants are per-(index revision, field-scope) invariants
    # — memoize on the epoch-keyed handle cache so repeated queries run
    # one collect, not two, and appends to the same path invalidate.
    scope_key = (
        tuple(include_fields) if include_fields else None,
        tuple(exclude_fields) if exclude_fields else None,
        doc_mode,
    )
    cache = _handle_cache(index, "_consts_cache")
    if scope_key in cache:
        n_units, avgdl = cache[scope_key]
    elif doc_mode:
        agg = _scoped_doc_lens(index, include_fields, exclude_fields).agg(
            F.count("*").alias("n"), F.sum("dl").alias("tok")
        ).collect()[0]
        n_units = float(agg["n"] or 0)
        avgdl = (agg["tok"] / agg["n"]) if agg["n"] else 1.0
        cache[scope_key] = (n_units, avgdl)
    else:
        fstats = _field_scope(index.field_stats(), include_fields, exclude_fields)
        agg = fstats.agg(
            F.sum("frame_count").alias("n"), F.sum("token_count").alias("tok")
        ).collect()[0]
        n_units = float(agg["n"] or 0)
        avgdl = (agg["tok"] / agg["n"]) if agg["n"] else 1.0
        cache[scope_key] = (n_units, avgdl)

    weights: Dict[str, float] = {}
    for t in term_values:
        df_t = ff.get(t)
        if df_t is None or n_units == 0:
            weights[t] = 0.0
        elif scorer in ("bm25", "bm25_doc"):
            weights[t] = math.log(1.0 + (n_units - df_t + 0.5) / (df_t + 0.5))
        else:
            weights[t] = 1.0 + math.log(n_units / (df_t + 1.0))
    return weights, n_units, avgdl


def filter_frames(
    index,
    must: Sequence[TermSpec] = (),
    should: Sequence[TermSpec] = (),
    at_least_n: Optional[Tuple[int, Sequence[TermSpec]]] = None,
    must_not: Sequence[TermSpec] = (),
    metadata: Optional[dict] = None,
    include_fields: Optional[Sequence[str]] = None,
    exclude_fields: Optional[Sequence[str]] = None,
    scorer: str = "tfidf",
    k1: float = BM25_K1,
    b: float = BM25_B,
    unit: str = "frame",
    schema=None,
    field_boosts: Optional[dict] = None,
) -> DataFrame:
    """Boolean retrieval returning all qualifying units with scores.

    Result columns: ``doc_id`` (+ ``field``, ``frame_seq`` when
    unit='frame'), ``score``.  Use :func:`search` for ranked top-k.

    ``field_boosts`` (``{field: weight}``, missing fields weight 1.0)
    weights fields against each other (title > body); a row-local map
    lookup, no plan change.  Boolean gating (must/should counts) is
    unaffected: a boost of 0.0 silences a field's score without
    un-matching it (use ``exclude_fields`` to remove it entirely).
    Frame scorers (tfidf/bm25) multiply each posting's contribution;
    ``bm25_doc`` applies BM25F proper (Robertson/Zaragoza) — the
    weighted tf sum Σ_field w_f·tf_f feeds the saturation, so boosting
    a field raises saturated relevance rather than scaling a
    saturated score.
    """
    if not (must or should or at_least_n):
        raise ValueError("need at least one positive term (must/should/at_least_n)")
    if schema is not None:
        from caterpillar_spark.schema import UnknownFieldError

        for fname in [*(include_fields or ()), *(exclude_fields or ())]:
            if fname not in schema:
                raise UnknownFieldError(
                    f"{fname!r} is not defined on this index"
                )
    spark = index.frames.sparkSession if isinstance(index, MemoryIndex) else index.spark

    rows = _groups(must, should, at_least_n or None, must_not)
    weights, n_frames, avgdl = _resolve_weights(
        index, rows, include_fields, exclude_fields, scorer
    )
    if all(weights[t] == 0.0 for t, _, kind in rows if kind != "exclude"):
        # Early exit: no positive term exists in the index
        # (reference sqlite.py:1340-1345).
        empty_schema = (
            "doc_id long, field string, frame_seq int, score double"
            if unit == "frame" else "doc_id long, score double"
        )
        return spark.createDataFrame([], empty_schema)

    qdf = spark.createDataFrame(
        [(t, g, kind, float(weights[t])) for t, g, kind in rows],
        "term string, group_id int, kind string, weight double",
    )

    # Bucket pruning + a literal term predicate (redundant with the join
    # semantically, but as a literal it pushes into the parquet scan
    # where the term-sorted file layout turns it into row-group min/max
    # pruning); buckets are computed driver-side — no pre-job.
    posts = _pruned_postings(index, spark, [t for t, _, _ in rows])
    posts = _field_scope(posts, include_fields, exclude_fields)
    if metadata:
        posts = posts.where(metadata_predicate(metadata, schema=schema))

    joined = posts.join(F.broadcast(qdf), "term")

    positive = F.col("kind") != "exclude"
    if scorer == "bm25_doc":
        # True document-granularity BM25 (the WAND formula,
        # query/wand.py:29-31): tf summed over the doc's frames BEFORE
        # saturation, dl = document token count, idf over document
        # frequencies.  One extra partial-agg shuffle vs the frame
        # scorers; ``unit`` must be 'document'.  With ``field_boosts``
        # this is BM25F proper (Robertson/Zaragoza): the weighted tf
        # sum tf_doc = Σ_field w_f·tf_f feeds the saturation, so a
        # boosted field raises saturated relevance instead of scaling
        # an already-saturated score.
        if unit != "document":
            raise ValueError("scorer='bm25_doc' requires unit='document'")
        tf_term = F.col("freq").cast("double")
        if field_boosts:
            kv = []
            for fname, boost in sorted(field_boosts.items()):
                kv.extend([F.lit(fname), F.lit(float(boost))])
            tf_term = tf_term * F.coalesce(
                F.element_at(F.create_map(*kv), F.col("field")), F.lit(1.0)
            )
        per_term = joined.groupBy(
            "doc_id", "term", "group_id", "kind", "weight"
        ).agg(F.sum(tf_term).alias("tf"))
        joined = per_term.join(
            _scoped_doc_lens(index, include_fields, exclude_fields), "doc_id"
        )
        contrib = F.col("weight") * (
            F.col("tf") * (k1 + 1.0)
        ) / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
    elif scorer == "bm25":
        contrib = F.col("weight") * (
            F.col("freq") * (k1 + 1.0)
        ) / (
            F.col("freq")
            + k1 * (1.0 - b + b * F.col("frame_tokens") / F.lit(avgdl))
        )
    else:
        contrib = F.col("freq") * F.col("weight")

    if field_boosts and scorer != "bm25_doc":
        # frame scorers: per-posting multiplier (bm25_doc weights tf
        # inside its saturation sum above — BM25F proper)
        kv = []
        for fname, boost in sorted(field_boosts.items()):
            kv.extend([F.lit(fname), F.lit(float(boost))])
        contrib = contrib * F.coalesce(
            F.element_at(F.create_map(*kv), F.col("field")), F.lit(1.0)
        )

    # Frame identity is (doc_id, field, frame_seq): frame ordinals are
    # per-(doc, field), so a multi-field index must not conflate the
    # same-numbered frames of different fields (reference frame ids are
    # globally unique; tests/test_index_query.py multi-field invariants).
    keys = ["doc_id"] if unit == "document" else ["doc_id", "field", "frame_seq"]
    n_must = len(set(g for _, g, kind in rows if kind == "must"))

    agg = joined.groupBy(*keys).agg(
        F.sum(F.when(positive, contrib).otherwise(0.0)).alias("score"),
        F.countDistinct(
            F.when(F.col("kind") == "must", F.col("group_id"))
        ).alias("_must_hits"),
        F.countDistinct(
            F.when(F.col("kind") == "nmin", F.col("group_id"))
        ).alias("_nmin_hits"),
        F.max(F.when(~positive, 1).otherwise(0)).alias("_excluded"),
        F.max(F.when(positive, 1).otherwise(0)).alias("_positive"),
    )

    cond = (F.col("_excluded") == 0) & (F.col("_positive") == 1)
    if n_must:
        cond = cond & (F.col("_must_hits") == n_must)
    if at_least_n:
        cond = cond & (F.col("_nmin_hits") >= at_least_n[0])
    return agg.where(cond).select(*keys, "score")


def search_many(
    index,
    queries: Dict[str, dict],
    k: int = 10,
    unit: str = "frame",
    scorer: str = "tfidf",
    k1: float = BM25_K1,
    b: float = BM25_B,
    metadata: Optional[dict] = None,
    include_fields: Optional[Sequence[str]] = None,
    exclude_fields: Optional[Sequence[str]] = None,
    schema=None,
) -> DataFrame:
    """Ranked top-k for Q queries in ONE Spark job.

    ``queries`` maps query_id -> a boolean spec dict with any of
    ``must`` / ``should`` / ``at_least_n`` / ``must_not`` (the
    :func:`filter_frames` arguments); scorer/unit/field-scope/metadata
    are shared across the batch.  Result: one relation
    ``(query_id, <unit keys>, score)`` holding each query's top-k in
    rank order — per-query rows identical to :func:`search`.

    Why: the bench shows ~0.5-1 s per query is Spark job-scheduling
    latency, not scan cost (BASELINE.md).  Batching amortizes it: the
    union of all queries' terms drives ONE broadcast join into the
    postings scan (still bucket-pruned to the union's term buckets),
    one partial-aggregated groupBy keyed by (query_id, unit), and one
    per-query window top-k — a term shared by several queries is
    scanned once.  Statistics resolve driver-side from the same
    epoch-keyed cache the single-query path uses, so a warm batch runs
    exactly one Spark job for Q queries.
    """
    if not queries:
        raise ValueError("queries must be a non-empty {query_id: spec} dict")
    spark = index.frames.sparkSession if isinstance(index, MemoryIndex) else index.spark

    all_rows: List[Tuple[str, str, int, str]] = []
    per_query: Dict[str, List[Tuple[str, int, str]]] = {}
    for qid, spec in queries.items():
        rows = _groups(
            spec.get("must", ()),
            spec.get("should", ()),
            spec.get("at_least_n") or None,
            spec.get("must_not", ()),
        )
        if not any(kind != "exclude" for _, _, kind in rows):
            raise ValueError(
                f"query {qid!r} needs at least one positive term "
                "(must/should/at_least_n)"
            )
        per_query[qid] = rows
        all_rows.extend((qid, t, g, kind) for t, g, kind in rows)

    weights, n_units, avgdl = _resolve_weights(
        index, [(t, g, kind) for _, t, g, kind in all_rows],
        include_fields, exclude_fields, scorer,
    )

    empty_schema = (
        "query_id string, doc_id long, field string, frame_seq int, score double"
        if unit == "frame"
        else "query_id string, doc_id long, score double"
    )
    live = {
        qid: rows
        for qid, rows in per_query.items()
        if any(weights[t] != 0.0 for t, _, kind in rows if kind != "exclude")
    }
    if not live:
        return spark.createDataFrame([], empty_schema)

    qrows = []
    for qid, rows in live.items():
        n_must = len({g for _, g, kind in rows if kind == "must"})
        nmin = (queries[qid].get("at_least_n") or (0, ()))[0]
        qrows.extend(
            (qid, t, g, kind, float(weights[t]), n_must, nmin)
            for t, g, kind in rows
        )
    qdf = spark.createDataFrame(
        qrows,
        "query_id string, term string, group_id int, kind string, "
        "weight double, n_must int, nmin int",
    )

    union_terms = sorted({t for _, t, _, _, _, _, _ in qrows})
    posts = _pruned_postings(index, spark, union_terms)
    posts = _field_scope(posts, include_fields, exclude_fields)
    if metadata:
        posts = posts.where(metadata_predicate(metadata, schema=schema))

    joined = posts.join(F.broadcast(qdf), "term")

    positive = F.col("kind") != "exclude"
    if scorer == "bm25_doc":
        if unit != "document":
            raise ValueError("scorer='bm25_doc' requires unit='document'")
        per_term = joined.groupBy(
            "query_id", "doc_id", "term", "group_id", "kind",
            "weight", "n_must", "nmin",
        ).agg(F.sum("freq").alias("tf"))
        joined = per_term.join(
            _scoped_doc_lens(index, include_fields, exclude_fields), "doc_id"
        )
        contrib = F.col("weight") * (
            F.col("tf") * (k1 + 1.0)
        ) / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
    elif scorer == "bm25":
        contrib = F.col("weight") * (
            F.col("freq") * (k1 + 1.0)
        ) / (
            F.col("freq")
            + k1 * (1.0 - b + b * F.col("frame_tokens") / F.lit(avgdl))
        )
    else:
        contrib = F.col("freq") * F.col("weight")

    keys = ["doc_id"] if unit == "document" else ["doc_id", "field", "frame_seq"]
    agg = joined.groupBy("query_id", *keys).agg(
        F.sum(F.when(positive, contrib).otherwise(0.0)).alias("score"),
        F.countDistinct(
            F.when(F.col("kind") == "must", F.col("group_id"))
        ).alias("_must_hits"),
        F.countDistinct(
            F.when(F.col("kind") == "nmin", F.col("group_id"))
        ).alias("_nmin_hits"),
        F.max(F.when(~positive, 1).otherwise(0)).alias("_excluded"),
        F.max(F.when(positive, 1).otherwise(0)).alias("_positive"),
        F.max("n_must").alias("_n_must"),  # per-query constants
        F.max("nmin").alias("_nmin"),
    )
    qualified = agg.where(
        (F.col("_excluded") == 0)
        & (F.col("_positive") == 1)
        & (F.col("_must_hits") == F.col("_n_must"))
        & (F.col("_nmin_hits") >= F.col("_nmin"))
    )

    from pyspark.sql.window import Window

    order = [F.desc("score")] + [F.asc(c) for c in keys]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        qualified.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .select("query_id", *keys, "score")
    )


def search(
    index,
    k: int = 10,
    unit: str = "frame",
    pagination: Optional[Tuple[float, Tuple[int, ...]]] = None,
    **kwargs,
) -> DataFrame:
    """Ranked top-k retrieval: score desc, (doc_id, frame_seq) asc
    deterministic tie-break (reference sqlite.py:1452-1460 orders by
    score desc, id asc).

    ``pagination`` is a keyset resume point ``(score, ids)``: results
    strictly after it in rank order (reference sqlite.py:1446-1453).
    """
    res = filter_frames(index, unit=unit, **kwargs)
    keys = ["doc_id"] if unit == "document" else ["doc_id", "field", "frame_seq"]
    if pagination:
        last_score, last_ids = pagination
        tail = F.lit(False)
        for i in range(len(keys)):
            step = F.col("score") == F.lit(last_score)
            for j in range(i):
                step = step & (F.col(keys[j]) == F.lit(last_ids[j]))
            step = step & (F.col(keys[i]) > F.lit(last_ids[i]))
            tail = tail | step
        res = res.where((F.col("score") < F.lit(last_score)) | tail)
    order = [F.desc("score")] + [F.asc(c) for c in keys]
    return res.orderBy(*order).limit(k)
