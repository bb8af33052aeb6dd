"""Two-hundred-sixth oracle-registry module: customer-base "buy till
you die" behavioral signals — alive-probability and visit
clumpiness, the two inputs a CRM pipeline derives before any churn
model.

  * palive_users — the geometric P(alive) heuristic that
    approximates Pareto/BG-NBD: for a user with f repeat events,
    last activity at t_x of an observation window T (per-user,
    first-event-anchored), P(alive) = (t_x / T)^f — a user with
    many events who went quiet mid-window is probably gone, a
    2-event user with the same recency is probably fine.  Emits the
    alive-probability deciles and the share below 0.1 (the
    reactivation-campaign audience size).

  * clumpiness_users — Zhang/Bradlow/Small clumpiness of each
    user's event timing: with the f+1 normalized inter-event gaps
    x_i (including both boundary gaps), C = 1 + sum x ln x /
    ln(f+2); C = 0 for perfectly regular visits, → 1 for one burst.
    Clumpy users respond to triggers, regular users to schedules —
    segmentation that frequency alone cannot see.  Reports the
    activity-weighted mean, the regular/clumpy split at the 0.5
    line, and the extremes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PALIVE_SQL = """
    WITH horizon AS (
      SELECT MAX(epoch_us(ts)) AS t_end FROM events
    ),
    per_user AS (
      SELECT user_id, COUNT(*) - 1 AS f,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1e6 AS tx,
             ((SELECT t_end FROM horizon) - MIN(epoch_us(ts))) / 1e6 AS t
      FROM events GROUP BY user_id
      HAVING COUNT(*) >= 2 AND MAX(epoch_us(ts)) > MIN(epoch_us(ts))
    ),
    palive AS (
      SELECT user_id, f,
             POW(tx / t, f) AS p
      FROM per_user WHERE t > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(p), 6) AS mean_palive,
           ROUND(MIN(p), 6) AS min_palive,
           ROUND(AVG(CASE WHEN p < 0.1 THEN 1.0 ELSE 0.0 END), 6)
             AS share_likely_churned,
           ROUND(AVG(CASE WHEN p > 0.9 THEN 1.0 ELSE 0.0 END), 6)
             AS share_likely_alive
    FROM palive
"""


@register("palive_users", _PALIVE_SQL)
def palive_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    horizon = ev.agg(F.max(us).alias("t_end"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            (F.count("*") - 1).alias("f"),
            ((F.max(us) - F.min(us)) / 1e6).alias("tx"),
            F.min(us).alias("t0"),
            F.max(us).alias("t1"),
        )
        .where((F.col("f") >= 1) & (F.col("t1") > F.col("t0")))
    )
    palive = (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            "f",
            ((F.col("t_end") - F.col("t0")) / 1e6).alias("t"),
            "tx",
        )
        .where(F.col("t") > 0)
        .select(
            "user_id",
            F.pow(F.col("tx") / F.col("t"), F.col("f")).alias("p"),
        )
    )
    return palive.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("p"), 6).alias("mean_palive"),
        F.round(F.min("p"), 6).alias("min_palive"),
        F.round(
            F.avg(F.when(F.col("p") < 0.1, 1.0).otherwise(0.0)), 6
        ).alias("share_likely_churned"),
        F.round(
            F.avg(F.when(F.col("p") > 0.9, 1.0).otherwise(0.0)), 6
        ).alias("share_likely_alive"),
    )


_CLUMP_SQL = """
    WITH horizon AS (
      SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events
    ),
    stamped AS (
      SELECT user_id, epoch_us(ts) AS t, event_id FROM events
    ),
    gaps AS (
      SELECT user_id,
             (t - COALESCE(LAG(t) OVER (PARTITION BY user_id
                                        ORDER BY t, event_id),
                           (SELECT t0 FROM horizon))) AS g
      FROM stamped
      UNION ALL
      SELECT user_id,
             (SELECT t1 FROM horizon) - MAX(t) AS g
      FROM stamped GROUP BY user_id
    ),
    norm AS (
      SELECT user_id,
             CAST(g AS DOUBLE)
               / SUM(g) OVER (PARTITION BY user_id) AS x,
             COUNT(*) OVER (PARTITION BY user_id) AS m
      FROM gaps
    ),
    c AS (
      SELECT user_id, MAX(m) AS m,
             1 + SUM(CASE WHEN x > 0 THEN x * LN(x) ELSE 0 END) / LN(MAX(m))
               AS c
      FROM norm WHERE m >= 3
      GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(c), 6) AS mean_clumpiness,
           ROUND(MAX(c), 6) AS max_clumpiness,
           ROUND(AVG(CASE WHEN c > 0.5 THEN 1.0 ELSE 0.0 END), 6)
             AS share_clumpy
    FROM c
"""


@register("clumpiness_users", _CLUMP_SQL)
def clumpiness_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    horizon = ev.agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
    stamped = ev.select("user_id", us.alias("t"), "event_id")
    wu = Window.partitionBy("user_id").orderBy("t", "event_id")
    inner = stamped.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        (
            F.col("t")
            - F.coalesce(F.lag("t").over(wu), F.col("t0"))
        ).alias("g"),
    )
    tail = (
        stamped.groupBy("user_id")
        .agg(F.max("t").alias("tmax"))
        .crossJoin(F.broadcast(horizon))
        .select("user_id", (F.col("t1") - F.col("tmax")).alias("g"))
    )
    gaps = inner.unionByName(tail)
    wp = Window.partitionBy("user_id")
    norm = gaps.select(
        "user_id",
        (F.col("g").cast("double") / F.sum("g").over(wp)).alias("x"),
        F.count("*").over(wp).alias("m"),
    )
    c = (
        norm.where(F.col("m") >= 3)
        .groupBy("user_id")
        .agg(
            F.max("m").alias("m"),
            (
                1
                + F.sum(
                    F.when(
                        F.col("x") > 0, F.col("x") * F.log("x")
                    ).otherwise(0.0)
                )
                / F.log(F.max("m").cast("double"))
            ).alias("c"),
        )
    )
    return c.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("c"), 6).alias("mean_clumpiness"),
        F.round(F.max("c"), 6).alias("max_clumpiness"),
        F.round(
            F.avg(F.when(F.col("c") > 0.5, 1.0).otherwise(0.0)), 6
        ).alias("share_clumpy"),
    )
