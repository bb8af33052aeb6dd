"""Hundred-sixty-sixth oracle-registry module: forecast-skill
benchmarking and complexity-aware series distance over the per-type
daily mean series (ROUNDED to 6 at the daily rollup, as always).

  * theil_u_events — Theil's U2 forecast-skill ratio per event type:
    drift forecast y_hat_t = y_{t-1} + (y_n - y_1)/(n-1) (the drift
    term in closed form, so both engines use the identical constant)
    vs the naive no-change forecast; U2 = RMSE(drift)/RMSE(naive).
    U2 < 1 → the model beats persistence, the only honest baseline
    for trending series; the scale-free sibling of mase_events
    (which normalizes by in-sample naive MAE instead).

  * cid_events — complexity-invariant distance between every pair
    of event-type series (Batista et al.): CE = sqrt(sum of squared
    first differences) per series, CID(a,b) = euclidean(a,b) *
    max(CE)/min(CE) over day-aligned values.  Plain euclidean calls
    a flat line "close" to a jagged one of equal mean; the CE
    factor penalizes comparing series of different complexity —
    the right nearest-neighbor metric for workload-shape clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY_TYPE = """
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS m
      FROM events GROUP BY 1, 2
"""


_THEIL_SQL = f"""
    WITH daily AS ({_DAILY_TYPE}),
    drift AS (
      SELECT event_type,
             (MAX_BY(m, d) - MIN_BY(m, d)) / (COUNT(*) - 1) AS c
      FROM daily GROUP BY event_type
    ),
    lagged AS (
      SELECT dy.event_type, dy.m AS y,
             LAG(dy.m) OVER (PARTITION BY dy.event_type ORDER BY dy.d)
               AS yl,
             dr.c
      FROM daily dy JOIN drift dr ON dr.event_type = dy.event_type
    ),
    err AS (
      SELECT event_type,
             SUM((yl - y) * (yl - y)) AS sse_naive,
             SUM((yl + c - y) * (yl + c - y)) AS sse_drift,
             COUNT(*) AS n
      FROM lagged WHERE yl IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(SQRT(sse_naive / n), 6) AS rmse_naive,
           ROUND(SQRT(sse_drift / n), 6) AS rmse_drift,
           ROUND(SQRT(sse_drift / sse_naive), 6) AS theil_u2
    FROM err
    ORDER BY event_type
"""


@register("theil_u_events", _THEIL_SQL)
def theil_u_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    drift = daily.groupBy("event_type").agg(
        (
            (F.max_by("m", "d") - F.min_by("m", "d")) / (F.count("*") - 1)
        ).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = (
        daily.join(drift, "event_type")
        .select(
            "event_type",
            F.col("m").alias("y"),
            F.lag("m").over(w).alias("yl"),
            "c",
        )
        .where(F.col("yl").isNotNull())
    )
    err = lagged.groupBy("event_type").agg(
        F.sum((F.col("yl") - F.col("y")) * (F.col("yl") - F.col("y"))).alias(
            "sse_naive"
        ),
        F.sum(
            (F.col("yl") + F.col("c") - F.col("y"))
            * (F.col("yl") + F.col("c") - F.col("y"))
        ).alias("sse_drift"),
        F.count("*").alias("n"),
    )
    return err.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt(F.col("sse_naive") / F.col("n")), 6).alias("rmse_naive"),
        F.round(F.sqrt(F.col("sse_drift") / F.col("n")), 6).alias("rmse_drift"),
        F.round(F.sqrt(F.col("sse_drift") / F.col("sse_naive")), 6).alias(
            "theil_u2"
        ),
    ).orderBy("event_type")


_CID_SQL = f"""
    WITH daily AS ({_DAILY_TYPE}),
    ce AS (
      SELECT event_type,
             SQRT(SUM(dd * dd)) AS ce
      FROM (
        SELECT event_type,
               m - LAG(m) OVER (PARTITION BY event_type ORDER BY d) AS dd
        FROM daily
      ) WHERE dd IS NOT NULL
      GROUP BY event_type
    ),
    dist AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             SQRT(SUM((a.m - b.m) * (a.m - b.m))) AS ed
      FROM daily a JOIN daily b
        ON a.d = b.d AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT d.ta AS type_a, d.tb AS type_b,
           ROUND(d.ed, 4) AS euclid,
           ROUND(d.ed * GREATEST(ca.ce, cb.ce) / LEAST(ca.ce, cb.ce), 4)
             AS cid
    FROM dist d
    JOIN ce ca ON ca.event_type = d.ta
    JOIN ce cb ON cb.event_type = d.tb
    ORDER BY type_a, type_b
"""


@register("cid_events", _CID_SQL)
def cid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    w = Window.partitionBy("event_type").orderBy("d")
    ce = (
        daily.select(
            "event_type", (F.col("m") - F.lag("m").over(w)).alias("dd")
        )
        .where(F.col("dd").isNotNull())
        .groupBy("event_type")
        .agg(F.sqrt(F.sum(F.col("dd") * F.col("dd"))).alias("ce"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    dist = (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("a.m") - F.col("b.m"))
                    * (F.col("a.m") - F.col("b.m"))
                )
            ).alias("ed")
        )
    )
    ca = ce.select(F.col("event_type").alias("ta"), F.col("ce").alias("cea"))
    cb = ce.select(F.col("event_type").alias("tb"), F.col("ce").alias("ceb"))
    return (
        dist.join(F.broadcast(ca), "ta")
        .join(F.broadcast(cb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.round("ed", 4).alias("euclid"),
            F.round(
                F.col("ed")
                * F.greatest("cea", "ceb")
                / F.least("cea", "ceb"),
                4,
            ).alias("cid"),
        )
        .orderBy("type_a", "type_b")
    )
