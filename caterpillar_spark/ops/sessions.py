"""Gap-based sessionization of event streams (batch form).

The standard user-behavior rollup: consecutive events of one user
belong to one session while the inter-event gap stays under
``gap_seconds``; a larger gap starts a new session.  Used by training
-data pipelines to turn raw clickstreams into session documents and by
analytics to count engagement.

Scale shape: both windows partition by ``user_col`` — per-user
sequences are processed independently in parallel (no global window,
no skew beyond a genuinely hyperactive user), then ONE
partial-aggregated groupBy per (user, session).  Timestamps compare in
exact integer microseconds (``unix_micros``), so session boundaries
are deterministic — no float rounding at the gap threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize"]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Events → one row per session:
    ``(user_id, session_seq, session_start, session_end, n_events,
    duration_seconds, total_value)``.

    ``session_seq`` is the user's 1-based session ordinal by time.
    An inter-event gap STRICTLY greater than ``gap_seconds`` opens a
    new session (an exactly-at-threshold gap continues the session).
    """
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    # parquet event times are TIMESTAMP_NTZ; cast for unix_micros
    # (sessions interpret naive times on the session timezone's wall
    # clock — gap arithmetic is invariant to that choice)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us)
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > gap_us),
        1,
    ).otherwise(0)
    with_session = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_value"),
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("session_seq"),
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.min("_ts").alias("session_start"),
            F.max("_ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (F.unix_micros(F.max("_ts").cast("timestamp"))
                 - F.unix_micros(F.min("_ts").cast("timestamp")))
                / 1_000_000.0,
                6,
            ).alias("duration_seconds"),
            F.round(F.sum("_value"), 6).alias("total_value"),
        )
    )
