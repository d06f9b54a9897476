"""Web-scale corpus operations beyond the reference engine.

These are the training-data-pipeline operators a 100 TB corpus job
needs alongside the inverted index: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup), embedding similarity
search, text quality statistics / language ID / fingerprinting, and
multimodal binary-column plumbing.

All hot paths are JVM-side Spark SQL expressions (no Python UDFs);
hash functions are md5-based so the DuckDB correctness oracles can
reproduce them bit-for-bit.
"""

from caterpillar_spark.ops.multimodal import (
    decode_media,
    encode_fake_media,
    media_features,
    resize_metadata,
    sample_video_frames,
)
from caterpillar_spark.ops.textstats import (
    tokens_col,
    token_stats,
    bpe_token_stats,
    quality_scores,
    gopher_quality_flags,
    language_id,
    fingerprints,
    corpus_keyness,
    pii_scan,
)
from caterpillar_spark.ops.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidates,
    near_dup_clusters,
    simhash,
    ngram_jaccard_pairs,
    decontaminate,
    dedup_lines,
    html_structure_fingerprint,
)
from caterpillar_spark.ops.sampling import (
    select_survivors,
    token_budget_sample,
    stratified_sample,
    pack_sequences,
)
from caterpillar_spark.ops.weburl import (
    canonical_url,
    host_of,
    host_suffixes,
    host_filter,
    url_snapshot_dedup,
    host_stats,
    url_features,
)
from caterpillar_spark.ops.linkgraph import (
    extract_links,
    extract_anchor_texts,
    anchor_text_rollup,
    host_link_edges,
    host_degree,
    pagerank,
    hits,
    authority_boost,
    crawl_frontier,
    cap_per_host,
    host_reciprocity,
    extract_sitemap_urls,
    host_quality,
)
from caterpillar_spark.ops.robots import (
    parse_robots,
    robots_filter,
)
from caterpillar_spark.ops.similarity import (
    cosine_topk,
    embedding_lsh_candidates,
    embedding_near_dups,
    hyperplane_lsh_buckets,
    ann_topk,
    ivf_centroids,
    ivf_assign_col,
    ann_ivf_topk,
)

__all__ = [
    "tokens_col",
    "token_stats",
    "bpe_token_stats",
    "quality_scores",
    "gopher_quality_flags",
    "language_id",
    "fingerprints",
    "corpus_keyness",
    "pii_scan",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidates",
    "near_dup_clusters",
    "simhash",
    "ngram_jaccard_pairs",
    "decontaminate",
    "dedup_lines",
    "html_structure_fingerprint",
    "select_survivors",
    "token_budget_sample",
    "stratified_sample",
    "pack_sequences",
    "canonical_url",
    "host_of",
    "host_suffixes",
    "host_filter",
    "url_snapshot_dedup",
    "host_stats",
    "url_features",
    "extract_links",
    "extract_anchor_texts",
    "anchor_text_rollup",
    "host_link_edges",
    "host_degree",
    "pagerank",
    "hits",
    "authority_boost",
    "crawl_frontier",
    "cap_per_host",
    "host_reciprocity",
    "extract_sitemap_urls",
    "host_quality",
    "parse_robots",
    "robots_filter",
    "cosine_topk",
    "embedding_lsh_candidates",
    "embedding_near_dups",
    "hyperplane_lsh_buckets",
    "ann_topk",
    "ivf_centroids",
    "ivf_assign_col",
    "ann_ivf_topk",
    "decode_media",
    "encode_fake_media",
    "media_features",
    "resize_metadata",
    "sample_video_frames",
]
