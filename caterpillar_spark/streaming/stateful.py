"""Custom stateful streaming operators (applyInPandasWithState).

The reference engine is batch-only; these are the Spark-native
streaming counterparts a web-scale ingest pipeline runs in front of
the index/dedup ops:

* :func:`first_seen` — streaming exact-dedup: across micro-batches,
  emit only the first document observed per content fingerprint.
  Arbitrary stateful processing keyed by fingerprint
  (``applyInPandasWithState``): state is one boolean per key, Arrow
  batches in/out, optional processing-time TTL so the state store
  doesn't grow unboundedly on an infinite crawl (a TTL'd key readmits
  a later duplicate — the batch ``exact_dedup`` pass downstream is the
  exactness backstop; this operator is the cheap streaming prefilter).
* :func:`windowed_event_counts` — event-time tumbling-window
  aggregation with a watermark for late data.  Works identically on a
  batch DataFrame (no watermark) and a stream (watermark bounds state),
  which is what the correctness oracle exercises.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


FIRST_SEEN_STATE_SCHEMA = "seen boolean"


def _make_first_seen_fn(ttl_minutes: Optional[int]):
    """The per-key stateful function behind :func:`first_seen`
    (module-level factory so the TTL contract is unit-testable with a
    stub GroupState).

    TTL contract: Spark clears a key's timeout on EVERY invocation of
    the function for that key, so the timeout must be re-armed on every
    non-timeout invocation — arming only on first sighting (the r2
    shape) meant any later duplicate arrival cancelled the TTL and the
    key's state lived forever, defeating the bounded-state purpose on
    duplicate-heavy crawls."""

    def dedupe(
        key: Tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry: drop the key's state; nothing to emit.
            state.remove()
            return
        already = state.exists and state.get[0]
        emitted = False
        for pdf in batches:
            if already or emitted or len(pdf) == 0:
                continue
            yield pdf.iloc[:1]
            emitted = True
        if emitted and not already:
            state.update((True,))
        if ttl_minutes and (emitted or already):
            # unconditional re-arm (see docstring)
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return dedupe


def first_seen(
    df: DataFrame,
    fingerprint_col: str = "fp",
    ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Keep only the first row observed per ``fingerprint_col`` value
    across micro-batches.  Streaming-only (``applyInPandasWithState``
    requires a streaming relation); for batch frames use
    :func:`caterpillar_spark.ops.exact_dedup`.

    Output schema = input schema.  Within one key's batch the first row
    in input order wins; the common streaming case is one row per key
    per batch.
    """
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    return df.groupBy(F.col(fingerprint_col)).applyInPandasWithState(
        _make_first_seen_fn(ttl_minutes),
        outputStructType=out_schema,
        stateStructType=FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) row count
    and value sum.  On a stream pass ``watermark`` (e.g. ``'1 hour'``)
    to bound the aggregation state and admit late data up to that
    delay; on a batch DataFrame the same plan computes the exact
    answer (this is the oracle-checked path)."""
    src = events
    if watermark is not None and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
