"""Gap-based sessionization — split each key's event stream into
sessions wherever the inter-event gap exceeds a threshold.

Not in the reference; first-class for transcript analytics (a
"conversation episode" is exactly a session over turn timestamps).

Plan shape: two stacked windows over the same (key, ts) ordering —
lag to flag gap-starts, then a running sum to number sessions. Both
windows share one shuffle (same partitioning/ordering → Catalyst
plans a single sort+exchange), so sessionization costs exactly one
keyed shuffle at any scale. The streaming analogue is
``F.session_window`` (see streaming/stream.py); this is the batch
form with identical semantics on closed data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds a dense ``session_id`` (0-based per key) to every event."""
    # NTZ-safe epoch micros (session tz is pinned to UTC in session.py,
    # so NTZ -> TIMESTAMP is a pure reinterpretation)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", (F.sum(is_new).over(run) - 1).cast("int"))


def session_stats(sessions: DataFrame, key: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-session rollup: event count, start/end (epoch micros),
    duration. One partial+final hash aggregation."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return sessions.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
    )
