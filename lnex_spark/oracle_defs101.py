"""Hundred-first oracle-registry module: extreme-value capacity
planning and histogram design.

  * gumbel_maxima_events — method-of-moments Gumbel fit to the daily
    maxima of the event value stream: beta = sqrt(6)·sd/pi, mu =
    mean − gamma·beta (Euler-Mascheroni), and the T-day return
    levels mu − beta·ln(−ln(1−1/T)) for T = 30/100/365 — "the value
    exceeded once per T days".  Block-maxima extreme-value theory is
    how capacity planning turns a month of data into a p99.9-style
    provisioning number; population moments in raw form, identical
    constants both engines.

  * fd_binwidth_events — Freedman-Diaconis histogram bin-width
    selection per event type: h = 2·IQR/n^(1/3) with quartiles as
    EXACT ordered row picks (the percentile_disc discipline — no
    engine interpolation), plus the implied bin count over the
    type's range.  The principled default every histogram/sketch
    configuration step needs instead of a hardcoded bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_EULER_GAMMA = 0.5772156649015329

_GUMBEL_SQL = f"""
    WITH daily_max AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, MAX(value) AS mx
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(mx) AS mean_mx,
             sqrt(AVG(mx * mx) - AVG(mx) * AVG(mx)) AS sd_mx
      FROM daily_max
    ),
    fit AS (
      SELECT n, mean_mx, sd_mx,
             sqrt(6.0) * sd_mx / pi() AS beta,
             mean_mx - {_EULER_GAMMA} * (sqrt(6.0) * sd_mx / pi()) AS mu
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(mu, 6) AS gumbel_mu,
           ROUND(beta, 6) AS gumbel_beta,
           ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 30.0)), 6) AS rl_30d,
           ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 100.0)), 6) AS rl_100d,
           ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 365.0)), 6) AS rl_365d
    FROM fit
"""


@register("gumbel_maxima_events", _GUMBEL_SQL)
def gumbel_maxima_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily_max = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.max("value").alias("mx"))
    mom = daily_max.agg(
        F.count("*").alias("n"),
        F.avg("mx").alias("mean_mx"),
        F.sqrt(F.avg(F.col("mx") * F.col("mx")) - F.avg("mx") * F.avg("mx")).alias(
            "sd_mx"
        ),
    )
    beta = F.sqrt(F.lit(6.0)) * F.col("sd_mx") / F.lit(3.141592653589793)
    mu = F.col("mean_mx") - _EULER_GAMMA * beta

    def rl(t: float):
        return mu - beta * F.log(-F.log(1.0 - 1.0 / F.lit(t)))

    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(rl(30.0), 6).alias("rl_30d"),
        F.round(rl(100.0), 6).alias("rl_100d"),
        F.round(rl(365.0), 6).alias("rl_365d"),
    )


_FD_SQL = """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    quarts AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q1,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q3,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(q3 - q1, 6) AS iqr,
           ROUND(2.0 * (q3 - q1) / pow(n * 1.0, 1.0 / 3.0), 6) AS fd_binwidth,
           CAST(ceil((vmax - vmin) / (2.0 * (q3 - q1) / pow(n * 1.0, 1.0 / 3.0)))
                AS BIGINT) AS n_bins
    FROM quarts
"""


@register("fd_binwidth_events", _FD_SQL)
def fd_binwidth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    quarts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.25).cast("long"), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.75).cast("long"), F.col("value"))
        ).alias("q3"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    h = 2.0 * (F.col("q3") - F.col("q1")) / F.pow(F.col("n") * 1.0, 1.0 / 3.0)
    return quarts.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("q3") - F.col("q1"), 6).alias("iqr"),
        F.round(h, 6).alias("fd_binwidth"),
        F.ceil((F.col("vmax") - F.col("vmin")) / h).cast("long").alias("n_bins"),
    )
