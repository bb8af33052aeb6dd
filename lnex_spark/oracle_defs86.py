"""Eighty-sixth oracle-registry module: small-sample rate correction
and rank concordance.

  * eb_shrinkage_users — empirical-Bayes shrinkage of per-user click
    rates toward the corpus prior (pseudo-count alpha = 20): the
    James-Stein-flavored correction every leaderboard/quality-score
    pipeline needs so a 2-event user with 1 click does not outrank a
    1000-event user at 40%.  Emits the top-5 users by SHRUNK rate
    (ranked on rounded values, user_id tiebreak, so the pick is
    cross-engine exact) with raw vs shrunk rates side by side.

  * kendall_w_events — Kendall's coefficient of concordance W across
    weekday "judges" ranking event types by daily volume: rank sums
    from integer counts (count-desc, type tiebreak), W = 12S/(m²(k³−k)).
    Weekdays from datediff-mod-7 arithmetic (the dow-numbering-safe
    form seasonal_residuals_events established).  The inter-rater
    agreement statistic for "is the type mix stable across the
    week", exactly rational from integer ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_EB_ALPHA = 20

_EB_SQL = f"""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
      FROM events GROUP BY user_id
    ),
    prior AS (
      SELECT SUM(clicks) * 1.0 / SUM(n) AS mu FROM per_user
    ),
    shrunk AS (
      SELECT u.user_id, u.n, u.clicks,
             ROUND(u.clicks * 1.0 / u.n, 6) AS raw_rate,
             ROUND((u.clicks + {_EB_ALPHA} * p.mu) / (u.n + {_EB_ALPHA}), 6)
               AS shrunk_rate
      FROM per_user u, prior p
    )
    SELECT rk, user_id, n, clicks, raw_rate, shrunk_rate
    FROM (
      SELECT *, row_number() OVER (ORDER BY shrunk_rate DESC, user_id) AS rk
      FROM shrunk
    ) WHERE rk <= 5
"""


@register("eb_shrinkage_users", _EB_SQL)
def eb_shrinkage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
    )
    prior = per_user.agg((F.sum("clicks") * 1.0 / F.sum("n")).alias("mu"))
    shrunk = per_user.crossJoin(prior).select(
        "user_id",
        "n",
        "clicks",
        F.round(F.col("clicks") * 1.0 / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("clicks") + _EB_ALPHA * F.col("mu")) / (F.col("n") + _EB_ALPHA), 6
        ).alias("shrunk_rate"),
    )
    # top-5 pick over rounded rates — tiny global window (user count rows)
    w = Window.orderBy(F.desc("shrunk_rate"), F.asc("user_id"))
    return (
        shrunk.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("rk", "user_id", "n", "clicks", "raw_rate", "shrunk_rate")
    )


_KW_SQL = """
    WITH cells AS (
      SELECT CAST(datediff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) % 7 AS INTEGER)
               AS wd,
             event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT wd, event_type,
             row_number() OVER (PARTITION BY wd ORDER BY c DESC, event_type) AS rnk
      FROM cells
    ),
    sums AS (
      SELECT event_type, CAST(SUM(rnk) AS BIGINT) AS r_sum FROM ranked GROUP BY event_type
    ),
    consts AS (
      SELECT (SELECT COUNT(DISTINCT wd) FROM cells) AS m,
             (SELECT COUNT(*) FROM sums) AS k,
             (SELECT AVG(r_sum * 1.0) FROM sums) AS rbar
    )
    SELECT c.m AS n_judges, c.k AS n_items,
           ROUND(12.0 * SUM((s.r_sum - c.rbar) * (s.r_sum - c.rbar))
                 / (c.m * c.m * (c.k * c.k * c.k - c.k)), 6) AS kendall_w
    FROM sums s, consts c
    GROUP BY c.m, c.k
"""


@register("kendall_w_events", _KW_SQL)
def kendall_w_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.lit("2024-01-01").cast("date"),
            )
            % 7
        )
        .cast("int")
        .alias("wd"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("wd").orderBy(F.desc("c"), F.asc("event_type"))
    ranked = cells.select("wd", "event_type", F.row_number().over(w).alias("rnk"))
    sums = ranked.groupBy("event_type").agg(F.sum("rnk").cast("long").alias("r_sum"))
    consts = sums.agg(
        F.count("*").alias("k"), F.avg(F.col("r_sum") * 1.0).alias("rbar")
    ).crossJoin(cells.agg(F.countDistinct("wd").alias("m")))
    return (
        sums.crossJoin(consts)
        .groupBy("m", "k")
        .agg(
            F.round(
                12.0
                * F.sum((F.col("r_sum") - F.col("rbar")) * (F.col("r_sum") - F.col("rbar")))
                / (F.col("m") * F.col("m") * (F.col("k") * F.col("k") * F.col("k") - F.col("k"))),
                6,
            ).alias("kendall_w")
        )
        .select(
            F.col("m").alias("n_judges"), F.col("k").alias("n_items"), "kendall_w"
        )
    )
