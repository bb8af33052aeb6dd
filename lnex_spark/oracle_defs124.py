"""Hundred-twenty-fourth oracle-registry module: inventory decisions
under uncertainty and robust shape.

  * newsvendor_events — the newsvendor critical-fractile decision on
    daily click demand: with underage cost 2 and overage cost 1 the
    optimal stock is the 2/3 demand quantile (exact ordered pick);
    the op REPLAYS both the optimal-fractile policy and the naive
    mean-stock policy over the observed days and reports their
    realized costs — the quantile-not-mean decision lesson as
    measured money, and the operations-research entry point of the
    registry.

  * bowley_skew_events — Bowley (quartile) skewness per event type,
    (Q3 + Q1 − 2·Q2)/(Q3 − Q1), from exact ordered picks — the
    outlier-robust complement of the raw-moment skewness in
    moments_events: when the two disagree, the tails (not the body)
    carry the asymmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NV_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS d
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    ranked AS (
      SELECT d, row_number() OVER (ORDER BY d, day) AS rk,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    stock AS (
      SELECT
        (SELECT d FROM ranked WHERE rk = CAST(ceil(n * 2.0 / 3.0) AS BIGINT) LIMIT 1)
          AS q_stock,
        (SELECT CAST(ROUND(AVG(d * 1.0)) AS BIGINT) FROM daily) AS mean_stock
    ),
    costs AS (
      SELECT
        SUM(2 * GREATEST(r.d - s.q_stock, 0) + GREATEST(s.q_stock - r.d, 0))
          AS cost_fractile,
        SUM(2 * GREATEST(r.d - s.mean_stock, 0) + GREATEST(s.mean_stock - r.d, 0))
          AS cost_mean,
        COUNT(*) AS n_days,
        MAX(s.q_stock) AS q_stock, MAX(s.mean_stock) AS mean_stock
      FROM ranked r CROSS JOIN stock s
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(q_stock AS BIGINT) AS fractile_stock,
           CAST(mean_stock AS BIGINT) AS mean_stock,
           CAST(cost_fractile AS BIGINT) AS cost_fractile,
           CAST(cost_mean AS BIGINT) AS cost_mean,
           ROUND(1.0 - cost_fractile * 1.0 / cost_mean, 6) AS cost_saving
    FROM costs
"""


@register("newsvendor_events", _NV_SQL)
def newsvendor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.count("*").alias("d")
    )
    # ~30-row calendar-bounded global window
    w = Window.orderBy("d", "day")
    wn = Window.partitionBy()
    ranked = daily.select(
        "d", F.row_number().over(w).alias("rk"), F.count("*").over(wn).alias("n")
    )
    q_stock = (
        ranked.filter(F.col("rk") == F.ceil(F.col("n") * 2.0 / 3.0).cast("long"))
        .select(F.col("d").alias("q_stock"))
        .limit(1)
    )
    mean_stock = daily.agg(
        F.round(F.avg(F.col("d") * 1.0)).cast("long").alias("mean_stock")
    )
    stock = q_stock.crossJoin(mean_stock)
    costs = ranked.crossJoin(stock).agg(
        F.count("*").alias("n_days"),
        F.max("q_stock").alias("q_stock"),
        F.max("mean_stock").alias("mean_stock"),
        F.sum(
            2 * F.greatest(F.col("d") - F.col("q_stock"), F.lit(0))
            + F.greatest(F.col("q_stock") - F.col("d"), F.lit(0))
        ).alias("cost_fractile"),
        F.sum(
            2 * F.greatest(F.col("d") - F.col("mean_stock"), F.lit(0))
            + F.greatest(F.col("mean_stock") - F.col("d"), F.lit(0))
        ).alias("cost_mean"),
    )
    return costs.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("q_stock").cast("long").alias("fractile_stock"),
        F.col("mean_stock").cast("long").alias("mean_stock"),
        F.col("cost_fractile").cast("long").alias("cost_fractile"),
        F.col("cost_mean").cast("long").alias("cost_mean"),
        F.round(1.0 - F.col("cost_fractile") * 1.0 / F.col("cost_mean"), 6).alias(
            "cost_saving"
        ),
    )


_BOWLEY_SQL = """
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
             MAX(CASE WHEN rk = CAST(ceil(n * 0.50) AS BIGINT) THEN value END) AS q2,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q3
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(q1, 6) AS q1, ROUND(q2, 6) AS q2, ROUND(q3, 6) AS q3,
           ROUND((q3 + q1 - 2.0 * q2) / (q3 - q1), 6) AS bowley_skew
    FROM quarts
"""


@register("bowley_skew_events", _BOWLEY_SQL)
def bowley_skew_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(q):
        return F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * q).cast("long"), F.col("value"))
        )

    quarts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        pick(0.25).alias("q1"),
        pick(0.50).alias("q2"),
        pick(0.75).alias("q3"),
    )
    return quarts.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("q1", 6).alias("q1"),
        F.round("q2", 6).alias("q2"),
        F.round("q3", 6).alias("q3"),
        F.round(
            (F.col("q3") + F.col("q1") - 2.0 * F.col("q2")) / (F.col("q3") - F.col("q1")),
            6,
        ).alias("bowley_skew"),
    )
