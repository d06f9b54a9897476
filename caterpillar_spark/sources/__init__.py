from caterpillar_spark.sources.webtext import (
    WEBTEXT_SCHEMA,
    extract_text,
    ingest_webtext,
    synthetic_webtext,
)

__all__ = [
    "WEBTEXT_SCHEMA",
    "extract_text",
    "ingest_webtext",
    "synthetic_webtext",
]
