"""Hundred-eighteenth oracle-registry module: lead-lag predictability
and random-walk testing.

  * granger_events — Granger-style incremental predictability: does
    yesterday's CLICK count improve today's ERROR-count prediction
    beyond errors' own lag?  Restricted model y_t ~ y_{t−1} vs
    unrestricted y_t ~ y_{t−1} + x_{t−1}, both solved closed-form
    from raw moments (the 2-regressor determinant solve of
    mediation_events), with R² for both and the F statistic for the
    added regressor.  Where cross_corr_events measures association
    at lags, this asks the sharper conditional question — the
    pipeline form of "is this series actionable for forecasting
    that one".

  * variance_ratio_events — the Lo-MacKinlay variance-ratio test on
    the daily mean-value series: VR(2) = Var(2-day differences) /
    (2·Var(1-day differences)).  VR ≈ 1 is a random walk; VR < 1
    mean-reversion; VR > 1 momentum — the third leg of the
    time-structure triad with Durbin-Watson (residual serial
    correlation) and Hurst (long memory).  Two lag windows and one
    raw-moment pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_GRANGER_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1.0 AS x,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT y,
             lag(y) OVER (ORDER BY day) AS y1,
             lag(x) OVER (ORDER BY day) AS x1
      FROM daily
    ),
    obs AS (SELECT y, y1, x1 FROM lagged WHERE y1 IS NOT NULL AND x1 IS NOT NULL),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(y) AS my, AVG(y1) AS m1, AVG(x1) AS m2,
             AVG(y * y) - AVG(y) * AVG(y) AS vy,
             AVG(y1 * y1) - AVG(y1) * AVG(y1) AS v1,
             AVG(x1 * x1) - AVG(x1) * AVG(x1) AS v2,
             AVG(y * y1) - AVG(y) * AVG(y1) AS c01,
             AVG(y * x1) - AVG(y) * AVG(x1) AS c02,
             AVG(y1 * x1) - AVG(y1) * AVG(x1) AS c12
      FROM obs
    ),
    fits AS (
      SELECT n, vy,
             c01 * c01 / v1 AS expl_r,
             (c01 * c01 * v2 - 2.0 * c01 * c02 * c12 + c02 * c02 * v1)
               / (v1 * v2 - c12 * c12) AS expl_u
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(expl_r / vy, 6) AS r2_restricted,
           ROUND(expl_u / vy, 6) AS r2_unrestricted,
           ROUND(((vy - expl_r) - (vy - expl_u))
                 / ((vy - expl_u) / (n - 3.0)), 6) AS f_stat
    FROM fits
"""


@register("granger_events", _GRANGER_SQL)
def granger_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        (F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) * 1.0).alias(
            "x"
        ),
        (F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)) * 1.0).alias(
            "y"
        ),
    )
    # ~30-row calendar-bounded global window
    w = Window.orderBy("day")
    lagged = daily.select(
        "y", F.lag("y").over(w).alias("y1"), F.lag("x").over(w).alias("x1")
    )
    obs = lagged.filter(F.col("y1").isNotNull() & F.col("x1").isNotNull())

    def cov(a, b):
        return F.avg(F.col(a) * F.col(b)) - F.avg(a) * F.avg(b)

    mom = obs.agg(
        F.count("*").alias("n"),
        cov("y", "y").alias("vy"),
        cov("y1", "y1").alias("v1"),
        cov("x1", "x1").alias("v2"),
        cov("y", "y1").alias("c01"),
        cov("y", "x1").alias("c02"),
        cov("y1", "x1").alias("c12"),
    )
    expl_r = F.col("c01") * F.col("c01") / F.col("v1")
    expl_u = (
        F.col("c01") * F.col("c01") * F.col("v2")
        - 2.0 * F.col("c01") * F.col("c02") * F.col("c12")
        + F.col("c02") * F.col("c02") * F.col("v1")
    ) / (F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12"))
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(expl_r / F.col("vy"), 6).alias("r2_restricted"),
        F.round(expl_u / F.col("vy"), 6).alias("r2_unrestricted"),
        F.round(
            ((F.col("vy") - expl_r) - (F.col("vy") - expl_u))
            / ((F.col("vy") - expl_u) / (F.col("n") - 3.0)),
            6,
        ).alias("f_stat"),
    )


_VR_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, AVG(value) AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT y,
             y - lag(y, 1) OVER (ORDER BY day) AS d1,
             y - lag(y, 2) OVER (ORDER BY day) AS d2
      FROM daily
    ),
    mom AS (
      SELECT
        (SELECT AVG(d1 * d1) - AVG(d1) * AVG(d1) FROM lagged WHERE d1 IS NOT NULL)
          AS v1,
        (SELECT COUNT(*) FROM lagged WHERE d1 IS NOT NULL) AS n1,
        (SELECT AVG(d2 * d2) - AVG(d2) * AVG(d2) FROM lagged WHERE d2 IS NOT NULL)
          AS v2,
        (SELECT COUNT(*) FROM lagged WHERE d2 IS NOT NULL) AS n2
    )
    SELECT CAST(n1 AS BIGINT) AS n_diffs_1, CAST(n2 AS BIGINT) AS n_diffs_2,
           ROUND(v1, 6) AS var_1day,
           ROUND(v2, 6) AS var_2day,
           ROUND(v2 / (2.0 * v1), 6) AS variance_ratio
    FROM mom
"""


@register("variance_ratio_events", _VR_SQL)
def variance_ratio_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.avg("value").alias("y")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        (F.col("y") - F.lag("y", 1).over(w)).alias("d1"),
        (F.col("y") - F.lag("y", 2).over(w)).alias("d2"),
    )

    def var_of(c):
        d = lagged.filter(F.col(c).isNotNull())
        return d.agg(
            (F.avg(F.col(c) * F.col(c)) - F.avg(c) * F.avg(c)).alias(f"v_{c}"),
            F.count("*").alias(f"n_{c}"),
        )

    return (
        var_of("d1")
        .crossJoin(var_of("d2"))
        .select(
            F.col("n_d1").cast("long").alias("n_diffs_1"),
            F.col("n_d2").cast("long").alias("n_diffs_2"),
            F.round("v_d1", 6).alias("var_1day"),
            F.round("v_d2", 6).alias("var_2day"),
            F.round(F.col("v_d2") / (2.0 * F.col("v_d1")), 6).alias("variance_ratio"),
        )
    )
