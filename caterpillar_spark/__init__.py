"""caterpillar_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
library Data-drone/caterpillar (a single-node Python full-text indexing
and text-analytics engine).  Nothing here is a port: the reference tells
us WHAT to compute (frame-based tokenization, positional inverted index,
TF-IDF / BM25 retrieval, boolean composition, co-occurrence analytics);
the HOW is idiomatic PySpark — DataFrame/Catalyst plans, vectorized
Arrow UDFs, term-hash-partitioned index tables, broadcast query joins.

Layout:
  schema.py   declared Schema / FieldType layer: per-field analysers,
              metadata validation + value analysis
              (reference: processing/schema.py, index.py:1382-1428)
  analysis/   tokenizers, filters, analysers, sentence/paragraph split
              (reference: caterpillar/processing/analysis/*)
  framing.py  documents -> frames DataFrame (reference: processing/index.py:346-511)
  indexing/   frames -> postings + statistics -> partitioned index
              (reference: storage/_sqlite_scripts.py flush semantics)
  query/      boolean retrieval, TF-IDF + BM25 scoring, top-k,
              composition algebra (reference: storage/sqlite.py:1201-1474,
              composition.py)
  ops/        web-scale corpus operations beyond the reference: dedup
              (exact / MinHash-LSH / SimHash / ngram-Jaccard), embedding
              similarity search, text quality stats, multimodal plumbing
  webtext.py  deterministic synthetic Common-Crawl-style corpus generator
"""

__version__ = "0.1.0"
