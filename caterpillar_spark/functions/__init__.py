"""Scalar helper functions shared across the engine."""

from caterpillar_spark.functions.hashing import spark_xxhash64, xxh64

__all__ = ["spark_xxhash64", "xxh64"]
