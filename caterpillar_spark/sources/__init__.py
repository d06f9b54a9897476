from caterpillar_spark.sources.csv_schema import (
    classify_csv_columns,
    csv_has_header,
    read_csv_with_schema,
    sniff_csv_header,
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
    "csv_has_header",
    "extract_text",
    "ingest_webtext",
    "read_csv_with_schema",
    "read_webtext",
    "sniff_csv_header",
    "synthetic_webtext",
]
