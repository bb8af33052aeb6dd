"""Two-hundred-fourteenth oracle-registry module: cache working-set
theory on the event stream (user_id = the referenced "page") — the
two numbers that size a cache before any simulation.

  * working_set_events — Denning's average working-set size via the
    inter-reference identity: WSS(tau) = (1/T) * sum over accesses
    of min(gap to next same-user access, tau) (+ the trailing
    residency), evaluated for tau = 60 s, 300 s, 900 s, 3600 s
    without ANY sliding-window scan — the gap decomposition turns a
    quadratic windowed-distinct into one lag pass.  The WSS(tau)
    curve's knee is the state-store size for the streaming
    pipeline's keyed session state.

  * one_hit_wonders_users — the cache-admission case: share of
    users (objects) referenced exactly once overall and per day,
    plus the fraction of cache insertions those one-hit wonders
    would waste under insert-on-first-touch.  The TinyLFU
    doorkeeper argument in one groupBy: if ~30% of objects are
    one-hit, a first-touch-admitting cache wastes ~30% of its
    insertions on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_WSS_SQL = """
    WITH acc AS (
      SELECT user_id, epoch_us(ts) / 1e6 AS t, event_id FROM events
    ),
    gaps AS (
      SELECT user_id, t,
             LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
               AS gap
      FROM acc
    ),
    span AS (
      SELECT MAX(t) - MIN(t) AS big_t, MAX(t) AS t_end FROM acc
    ),
    taus AS (SELECT CAST(UNNEST([60, 300, 900, 3600]) AS DOUBLE) AS tau)
    SELECT t2.tau AS tau_s,
           ROUND(SUM(LEAST(COALESCE(g.gap, (SELECT t_end FROM span) - g.t),
                           t2.tau))
                 / (SELECT big_t FROM span), 6) AS avg_working_set,
           CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS n_objects
    FROM gaps g CROSS JOIN taus t2
    GROUP BY t2.tau
    ORDER BY tau_s
"""


@register("working_set_events", _WSS_SQL)
def working_set_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    acc = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6).alias("t"),
        "event_id",
    )
    wu = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = acc.select(
        "user_id", "t", (F.lead("t").over(wu) - F.col("t")).alias("gap")
    )
    span = acc.agg(
        (F.max("t") - F.min("t")).alias("big_t"), F.max("t").alias("t_end")
    )
    taus = ev.sparkSession.createDataFrame(
        [(60.0,), (300.0,), (900.0,), (3600.0,)], "tau double"
    )
    return (
        gaps.crossJoin(F.broadcast(taus))
        .crossJoin(F.broadcast(span))
        .groupBy("tau")
        .agg(
            F.round(
                F.sum(
                    F.least(
                        F.coalesce(
                            F.col("gap"), F.col("t_end") - F.col("t")
                        ),
                        F.col("tau"),
                    )
                )
                / F.max("big_t"),
                6,
            ).alias("avg_working_set"),
            F.countDistinct("user_id").cast("long").alias("n_objects"),
        )
        .select(F.col("tau").alias("tau_s"), "avg_working_set", "n_objects")
        .orderBy("tau_s")
    )


_OHW_SQL = """
    WITH overall AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    daily_ohw AS (
      SELECT d, AVG(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END) AS share
      FROM daily GROUP BY d
    )
    SELECT CAST((SELECT COUNT(*) FROM overall) AS BIGINT) AS n_objects,
           ROUND((SELECT AVG(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END)
                  FROM overall), 6) AS one_hit_share_overall,
           ROUND((SELECT AVG(share) FROM daily_ohw), 6)
             AS mean_daily_one_hit_share,
           ROUND((SELECT CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) / COUNT(*)
                  FROM daily), 6) AS wasted_insert_fraction
"""


@register("one_hit_wonders_users", _OHW_SQL)
def one_hit_wonders_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    overall = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).agg(F.count("*").alias("n"))
    ohw_overall = overall.agg(
        F.count("*").alias("n_objects"),
        F.avg(F.when(F.col("n") == 1, 1.0).otherwise(0.0)).alias("s1"),
    )
    daily_ohw = daily.groupBy("d").agg(
        F.avg(F.when(F.col("n") == 1, 1.0).otherwise(0.0)).alias("share")
    )
    mds = daily_ohw.agg(F.avg("share").alias("mds"))
    waste = daily.agg(
        (
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("w")
    )
    return (
        ohw_overall.crossJoin(F.broadcast(mds))
        .crossJoin(F.broadcast(waste))
        .select(
            F.col("n_objects").cast("long").alias("n_objects"),
            F.round("s1", 6).alias("one_hit_share_overall"),
            F.round("mds", 6).alias("mean_daily_one_hit_share"),
            F.round("w", 6).alias("wasted_insert_fraction"),
        )
    )
