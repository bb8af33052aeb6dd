"""Ninety-fifth oracle-registry module: switchback experimentation and
population-size estimation.

  * switchback_events — the time-switchback design used when
    treatment spills over between users (marketplaces, pricing):
    hour-parity defines alternating treatment windows, the per-day
    treated-minus-control gap is computed WITHIN each day (day fixed
    effects absorb the daily trend), and the overall effect is the
    day-size-weighted mean of those gaps.  One aggregation over
    (day, parity) cells; exact integer counts, rounded means.

  * capture_recapture_users — the Chapman capture-recapture estimate
    of total population size from two overlapping observation
    windows: the "population" is (user, type, hour-of-day) behavior
    cells (users themselves are too dense — every user recurs, so
    the estimator degenerates to the census), samples are week-1 vs
    week-2 sightings, N̂ = (n1+1)(n2+1)/(m+1) − 1 with m =
    recaptured cells.  The "how many entities exist that we have
    NOT seen" estimator — coverage planning for crawls/gazetteers
    when a full census is impossible; distinct-count aggregates,
    exact integers, reported against the observed union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SB_SQL = """
    WITH base AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(date_part('hour', ts) AS INTEGER) % 2 AS treated,
             value
      FROM events
    ),
    cells AS (
      SELECT day, treated, COUNT(*) AS n, AVG(value) AS m
      FROM base GROUP BY day, treated
    ),
    days AS (
      SELECT day,
             MAX(CASE WHEN treated = 1 THEN m END) AS m_t,
             MAX(CASE WHEN treated = 0 THEN m END) AS m_c,
             SUM(n) AS n_day
      FROM cells GROUP BY day
      HAVING MAX(CASE WHEN treated = 1 THEN m END) IS NOT NULL
         AND MAX(CASE WHEN treated = 0 THEN m END) IS NOT NULL
    ),
    tot AS (SELECT SUM(n_day) AS n_all FROM days)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(t.n_all) AS BIGINT) AS n_events,
           ROUND(SUM((d.n_day * 1.0 / t.n_all) * (d.m_t - d.m_c)), 6)
             AS switchback_effect
    FROM days d CROSS JOIN tot t
"""


@register("switchback_events", _SB_SQL)
def switchback_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        (F.hour("ts") % 2).alias("treated"),
        "value",
    )
    cells = base.groupBy("day", "treated").agg(
        F.count("*").alias("n"), F.avg("value").alias("m")
    )
    days = (
        cells.groupBy("day")
        .agg(
            F.max(F.when(F.col("treated") == 1, F.col("m"))).alias("m_t"),
            F.max(F.when(F.col("treated") == 0, F.col("m"))).alias("m_c"),
            F.sum("n").alias("n_day"),
        )
        .filter(F.col("m_t").isNotNull() & F.col("m_c").isNotNull())
    )
    tot = days.agg(F.sum("n_day").alias("n_all"))
    return days.crossJoin(tot).agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("n_all").cast("long").alias("n_events"),
        F.round(
            F.sum((F.col("n_day") * 1.0 / F.col("n_all")) * (F.col("m_t") - F.col("m_c"))),
            6,
        ).alias("switchback_effect"),
    )


_CR_SQL = """
    WITH s1 AS (
      SELECT DISTINCT user_id, event_type,
             CAST(date_part('hour', ts) AS INTEGER) AS h
      FROM events WHERE ts < TIMESTAMP '2024-01-08'
    ),
    s2 AS (
      SELECT DISTINCT user_id, event_type,
             CAST(date_part('hour', ts) AS INTEGER) AS h
      FROM events WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    ),
    m AS (SELECT COUNT(*) AS recaptured FROM s1 JOIN s2 USING (user_id, event_type, h)),
    counts AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT recaptured FROM m) AS m,
             (SELECT COUNT(*) FROM (SELECT user_id, event_type, h FROM s1
                                    UNION SELECT user_id, event_type, h FROM s2))
               AS observed_union
    )
    SELECT n1, n2, m, observed_union,
           ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6) AS chapman_estimate
    FROM counts
"""


@register("capture_recapture_users", _CR_SQL)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        "user_id", "event_type", F.hour("ts").alias("h"), "ts"
    )
    c1 = F.lit("2024-01-08").cast("timestamp")
    c2 = F.lit("2024-01-15").cast("timestamp")
    keys = ["user_id", "event_type", "h"]
    s1 = cells.filter(F.col("ts") < c1).select(*keys).distinct()
    s2 = cells.filter((F.col("ts") >= c1) & (F.col("ts") < c2)).select(*keys).distinct()
    n1 = s1.count()
    n2 = s2.count()
    m = s1.join(s2, keys).count()
    union = s1.union(s2).distinct().count()
    out = spark.createDataFrame(
        [(n1, n2, m, union)], "n1 long, n2 long, m long, observed_union long"
    )
    return out.select(
        "n1",
        "n2",
        "m",
        "observed_union",
        F.round(
            (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0, 6
        ).alias("chapman_estimate"),
    )
