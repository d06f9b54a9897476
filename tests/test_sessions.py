"""Gap-based sessionization (ops/sessions.py)."""

import datetime as dt

import pytest

from caterpillar_spark.ops.sessions import sessionize


def _t(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 10, minute, second, micro)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 31-min gap
        (1, _t(0), 1.0),
        (1, _t(10), 2.0),
        (1, _t(41), 4.0),       # 31 min after previous -> new session
        (1, _t(42), 8.0),
        # user 2: a gap of exactly 30 min continues the session
        (2, _t(0), 1.0),
        (2, _t(30), 1.0),
        # user 2: 30 min + 1 microsecond -> new session
        (2, _t(59, 59), 1.0),   # within session (29:59 after previous)
        (3, _t(5, 0, 123456), 5.0),  # singleton with microseconds
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def test_sessionize_boundaries_and_rollups(events):
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(events, gap_seconds=1800).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1), (3, 1)}

    s = got[(1, 1)]
    assert s["n_events"] == 2 and s["total_value"] == 3.0
    assert s["session_start"] == _t(0) and s["session_end"] == _t(10)
    assert s["duration_seconds"] == 600.0

    s = got[(1, 2)]
    assert s["n_events"] == 2 and s["total_value"] == 12.0

    # exactly-at-threshold gap did NOT split; the 29:59 follow-up stayed
    s = got[(2, 1)]
    assert s["n_events"] == 3
    assert s["session_end"] == _t(59, 59)

    s = got[(3, 1)]
    assert s["n_events"] == 1 and s["duration_seconds"] == 0.0
    assert s["session_start"].microsecond == 123456


def test_microsecond_over_threshold_splits(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=1800), 1.0),            # continues
        (1, base + dt.timedelta(seconds=3600, microseconds=1), 1.0),  # splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    seqs = sorted(
        r["session_seq"] for r in sessionize(df, gap_seconds=1800).collect()
    )
    assert seqs == [1, 2]
    with pytest.raises(ValueError):
        sessionize(df, gap_seconds=0)
