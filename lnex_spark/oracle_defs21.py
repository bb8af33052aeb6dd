"""Twenty-first oracle-registry module: time-series gap handling and
event-time window shapes.

  * locf_fill_events — forward-fill (last-observation-carried-forward)
    of a sparse metric via ``last_value(...) IGNORE NULLS`` over a
    running frame: the canonical sensor/metric gap-fill. Nulls are
    injected deterministically (event_id % 5) so both engines fill
    the same holes; the ordering is fully specified (ts, event_id).
    Same query, two spellings: DuckDB parses ``last_value(v IGNORE
    NULLS)``, Spark ``last_value(v) IGNORE NULLS``.
  * sliding_window_rates — event-time sliding windows
    (``window(ts, '2 hours', '1 hour')``): every event lands in
    exactly duration/slide = 2 windows. The DuckDB oracle re-derives
    the assignment as the UNION ALL of two hour-shifted tumbling
    aggregations — pinning the window-explosion semantics (row
    duplication factor) rather than trusting them.
  * session_window_users — the *native* ``session_window(ts, gap)``
    batch aggregation against a relational gap-sessionization oracle
    (lag > gap ⇒ boundary, cumsum ⇒ session id — the same derivation
    operators/sessions.py uses): session start / end / count per
    user must agree exactly. Spark's session end is last-event + gap,
    mirrored in the oracle.

At 100 TB: LOCF is one keyed window (entity-partitioned, no global
sort); a sliding window multiplies rows by duration/slide before the
hash agg (keep the ratio small — 2x here); session_window is
implemented by Spark as a sort-based merge per key, same shuffle as
the groupBy. All three stay in the JVM.

Reference parity note: LNEx ignores time entirely [SURVEY.md §2B
date/time row]; these ops evidence the temporal layer of the host
engine over the driver's ``events`` stream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LOCF_TEMPLATE = """
    WITH sparse AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 5 IN (1, 2) THEN NULL
                  ELSE CAST(round(value * 1000) AS BIGINT) END AS v
      FROM events WHERE user_id % 13 = 0
    )
    SELECT user_id, event_id, v AS raw_v,
           {last_value_ignore_nulls} OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
    FROM sparse
"""


@register(
    "locf_fill_events",
    _LOCF_TEMPLATE.format(last_value_ignore_nulls="last_value(v IGNORE NULLS)"),
)
def locf_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _LOCF_TEMPLATE.format(last_value_ignore_nulls="last_value(v) IGNORE NULLS")
    )


@register(
    "sliding_window_rates",
    """
    WITH shifted AS (
      SELECT date_trunc('hour', ts) AS ws, event_type,
             CAST(round(value * 1000) AS BIGINT) AS v
      FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type,
             CAST(round(value * 1000) AS BIGINT) AS v
      FROM events
    )
    SELECT ws, event_type, count(*) AS n, sum(v) AS sum_v
    FROM shifted GROUP BY ws, event_type
    """,
)
def sliding_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2h windows sliding by 1h: each event belongs to the windows
    starting at trunc_hour(ts) and trunc_hour(ts) - 1h; the oracle is
    that assignment written out as two shifted tumbles."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT w.start AS ws, event_type, count(*) AS n,
               sum(CAST(round(value * 1000) AS BIGINT)) AS sum_v
        FROM (SELECT window(ts, '2 hours', '1 hour') AS w, event_type, value
              FROM events)
        GROUP BY w.start, event_type
        """
    )


@register(
    "session_window_users",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE user_id % 19 = 0
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window must equal the lag/cumsum relational
    sessionization at the same 30-minute gap. Ties in ts within a
    user collapse into the same session either way, so the lag
    tiebreak (event_id) cannot split sessions differently."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id,
               sw.start AS session_start,
               sw.end AS session_end,
               count(*) AS n_events
        FROM (SELECT session_window(ts, '30 minutes') AS sw, user_id
              FROM events WHERE user_id % 19 = 0)
        GROUP BY user_id, sw
        """
    )
