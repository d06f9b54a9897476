from caterpillar_spark.sources.csv_schema import (
    classify_csv_columns,
    read_csv_with_schema,
)
from caterpillar_spark.sources.webtext import (
    WEBTEXT_SCHEMA,
    extract_text,
    ingest_webtext,
    read_webtext,
    synthetic_webtext,
)

__all__ = [
    "WEBTEXT_SCHEMA",
    "classify_csv_columns",
    "extract_text",
    "ingest_webtext",
    "read_csv_with_schema",
    "read_webtext",
    "synthetic_webtext",
]
