"""CSV ingestion with the reference's schema-inference heuristic.

Reference: ``generate_csv_schema`` peeks 20 rows and declares a column
TEXT when its average word count is >= 5, IGNORE otherwise, with a
header-detection heuristic (processing/schema.py:443-504, 507-540).
Spark already infers *types* (``inferSchema``); what we reproduce is the
reference's *role* classification — which columns are analysable text —
expressed as a small sampled aggregation instead of a driver-side peek.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

AVG_WORDS_TEXT = 5.0
SAMPLE_ROWS = 20


def classify_csv_columns(
    df: DataFrame, sample_rows: int = SAMPLE_ROWS
) -> Dict[str, str]:
    """column name -> 'TEXT' | 'IGNORE' by the reference's >=5 average
    words rule over the first ``sample_rows`` rows."""
    sample = df.limit(sample_rows)
    aggs = [
        F.avg(
            F.when(
                F.col(c).isNotNull(),
                F.size(F.split(F.trim(F.col(c).cast("string")), r"\s+")),
            ).otherwise(0)
        ).alias(c)
        for c in df.columns
    ]
    row = sample.agg(*aggs).collect()[0]
    return {
        c: "TEXT" if (row[c] or 0) >= AVG_WORDS_TEXT else "IGNORE"
        for c in df.columns
    }


def read_csv_with_schema(
    spark: SparkSession, path: str, delimiter: str = ",", header: str = "true"
) -> Tuple[DataFrame, Dict[str, str]]:
    """Load a CSV and classify its columns; returns (df, roles)."""
    df = (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .option("inferSchema", "true")
        .csv(path)
    )
    return df, classify_csv_columns(df)
