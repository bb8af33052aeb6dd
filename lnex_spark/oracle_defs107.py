"""Hundred-seventh oracle-registry module: order-statistic confidence
intervals and regression residual diagnostics.

  * median_ci_events — a distribution-free 95% confidence interval
    for each type's median from order statistics alone: ranks
    n/2 ± 1.96·sqrt(n)/2 (normal approximation to the binomial sign
    count), interval endpoints as EXACT ordered row picks.  No
    variance estimate, no bootstrap fan-out — the one-window way to
    put honest uncertainty on the medians the quantile ops report.

  * durbin_watson_events — the Durbin-Watson statistic on the
    residuals of the daily-value linear trend fit (slope/intercept
    closed-form from raw moments, the regr_price_qty discipline):
    DW = Σ(e_t − e_{t−1})² / Σe².  DW ≈ 2 means independent
    residuals; DW → 0 means the trend fit left serial correlation
    behind, i.e. the i.i.d. assumption under every per-day CI in
    this registry is wrong.  One ordered lag window over the
    30-day daily table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MCI_SQL = """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN value END)
               AS median,
             MAX(CASE WHEN rk = GREATEST(1,
                   CAST(ceil(n / 2.0 - 0.98 * sqrt(n * 1.0)) AS BIGINT))
                 THEN value END) AS ci_lo,
             MAX(CASE WHEN rk = LEAST(n,
                   CAST(ceil(n / 2.0 + 0.98 * sqrt(n * 1.0)) AS BIGINT))
                 THEN value END) AS ci_hi
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(median, 6) AS median,
           ROUND(ci_lo, 6) AS ci_lo,
           ROUND(ci_hi, 6) AS ci_hi
    FROM bounds
"""


@register("median_ci_events", _MCI_SQL)
def median_ci_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    lo_rk = F.greatest(
        F.lit(1),
        F.ceil(F.col("n") / 2.0 - 0.98 * F.sqrt(F.col("n") * 1.0)).cast("long"),
    )
    hi_rk = F.least(
        F.col("n"),
        F.ceil(F.col("n") / 2.0 + 0.98 * F.sqrt(F.col("n") * 1.0)).cast("long"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.5).cast("long"), F.col("value"))
        ).alias("median"),
        F.max(F.when(F.col("rk") == lo_rk, F.col("value"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == hi_rk, F.col("value"))).alias("ci_hi"),
    )
    return bounds.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("median", 6).alias("median"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
    )


_DW_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) AS DOUBLE) AS x,
             AVG(value) AS y
      FROM events GROUP BY 1, 2
    ),
    fit AS (
      SELECT (AVG(x * y) - AVG(x) * AVG(y)) / (AVG(x * x) - AVG(x) * AVG(x))
               AS slope,
             AVG(y) - (AVG(x * y) - AVG(x) * AVG(y))
               / (AVG(x * x) - AVG(x) * AVG(x)) * AVG(x) AS intercept
      FROM daily
    ),
    resid AS (
      SELECT d.day, d.y - (f.intercept + f.slope * d.x) AS e
      FROM daily d CROSS JOIN fit f
    ),
    lagged AS (
      SELECT e, lag(e) OVER (ORDER BY day) AS e_prev FROM resid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(CASE WHEN e_prev IS NOT NULL
                          THEN (e - e_prev) * (e - e_prev) ELSE 0 END)
                 / SUM(e * e), 6) AS durbin_watson
    FROM lagged
"""


@register("durbin_watson_events", _DW_SQL)
def durbin_watson_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("double")
        .alias("x"),
    ).agg(F.avg("value").alias("y"))
    slope = (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")) / (
        F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
    )
    fit = daily.agg(
        slope.alias("slope"), (F.avg("y") - slope * F.avg("x")).alias("intercept")
    )
    resid = daily.crossJoin(fit).select(
        "day", (F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))).alias("e")
    )
    # 30-row calendar-bounded global window
    lagged = resid.select("e", F.lag("e").over(Window.orderBy("day")).alias("e_prev"))
    return lagged.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum(
                F.when(
                    F.col("e_prev").isNotNull(),
                    (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev")),
                ).otherwise(0.0)
            )
            / F.sum(F.col("e") * F.col("e")),
            6,
        ).alias("durbin_watson"),
    )
