"""Unit tests for the as-of join and sessionization operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lnex_spark.operators.asof import asof_join_backward
from lnex_spark.operators.sessions import session_stats, sessionize


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, minute, second)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(20)),
            (3, "u1", _ts(5)),   # before any right row
            (4, "u2", _ts(10)),  # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), 100),
            ("u1", _ts(15), 200),
            ("u1", _ts(20), 300),  # equal ts: <= matches
        ],
        "user_id string, ts timestamp, state long",
    )
    out = asof_join_backward(left, right, on=["user_id"], ts_col="ts")
    got = {r["event_id"]: r["asof_state"] for r in out.collect()}
    assert got == {1: 100, 2: 300, 3: None, 4: None}
    assert out.count() == left.count()  # left-join semantics


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, "u1", _ts(0)),
            (2, "u1", _ts(10)),   # 10 min gap  -> same session
            (3, "u1", _ts(50)),   # 40 min gap  -> new session
            (4, "u1", _ts(55)),
            (5, "u2", _ts(0)),    # other key: independent numbering
        ],
        "event_id long, user_id string, ts timestamp",
    )
    s = sessionize(ev, gap_seconds=1800)
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}

    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in session_stats(s).collect()
    }
    assert stats[("u1", 0)] == (2, 10 * 60 * 1_000_000)
    assert stats[("u1", 1)] == (2, 5 * 60 * 1_000_000)
    assert stats[("u2", 0)] == (1, 0)


def test_asof_deterministic_across_parallelism(spark):
    """Same result at different partition counts (scale invariant)."""
    ev = spark.range(0, 500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 13).alias("ts"),
    )
    left = ev.filter(F.col("event_id") % 3 == 0)
    right = ev.filter(F.col("event_id") % 3 == 1).select(
        "user_id", "ts", F.col("event_id").alias("src")
    )
    a = asof_join_backward(left.repartition(2), right, on=["user_id"]).collect()
    b = asof_join_backward(left.repartition(16), right.repartition(16), on=["user_id"]).collect()
    key = lambda r: r["event_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
