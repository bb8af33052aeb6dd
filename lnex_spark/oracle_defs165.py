"""Hundred-sixty-fifth oracle-registry module: multivariate outlier
screening and agreement measurement on the daily two-metric frame
(mean purchase value, mean click value per day, each ROUNDED to 6 —
the same frame as hotelling_t2_events).

  * mahalanobis_outliers_events — squared Mahalanobis distance of
    each day from the centroid under the closed-form 2x2 covariance
    inverse: D^2 = (s22 dx^2 - 2 s12 dx dy + s11 dy^2) / det, with
    the 95% chi-square(2) cutoff 5.991 flagging multivariate
    outliers that neither per-metric z-score sees (a day can be
    unremarkable in each metric but impossible in their joint
    pattern).  The multivariate completion of zscore_outliers_events
    and the distance kernel behind propensity matching.

  * ccc_events — Lin's concordance correlation coefficient between
    the two daily metrics: CCC = 2 s_xy / (s_x^2 + s_y^2 +
    (xbar-ybar)^2), factored as Pearson r times the bias-correction
    C_b, which separates "correlated" from "actually agree on the
    45-degree line".  The metric for validating a cheap proxy
    metric against its expensive ground truth — corr alone
    overstates agreement under scale/location shift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
               AS x,
             ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
               AS y
      FROM events GROUP BY 1
"""


_MAHA_SQL = f"""
    WITH daily AS ({_DAILY}),
    ok AS (SELECT * FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
    mom AS (
      SELECT AVG(x) AS mx, AVG(y) AS my,
             AVG(x * x) - AVG(x) * AVG(x) AS s11,
             AVG(y * y) - AVG(y) * AVG(y) AS s22,
             AVG(x * y) - AVG(x) * AVG(y) AS s12
      FROM ok
    )
    SELECT o.d AS day,
           ROUND((m.s22 * (o.x - m.mx) * (o.x - m.mx)
                  - 2 * m.s12 * (o.x - m.mx) * (o.y - m.my)
                  + m.s11 * (o.y - m.my) * (o.y - m.my))
                 / (m.s11 * m.s22 - m.s12 * m.s12), 4) AS d2,
           CASE WHEN (m.s22 * (o.x - m.mx) * (o.x - m.mx)
                      - 2 * m.s12 * (o.x - m.mx) * (o.y - m.my)
                      + m.s11 * (o.y - m.my) * (o.y - m.my))
                     / (m.s11 * m.s22 - m.s12 * m.s12) > 5.991
                THEN 1 ELSE 0 END AS outlier
    FROM ok o CROSS JOIN mom m
    ORDER BY day
"""


@register("mahalanobis_outliers_events", _MAHA_SQL)
def mahalanobis_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("x"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("y"),
    )
    ok = daily.where(F.col("x").isNotNull() & F.col("y").isNotNull())
    mom = ok.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("s11"),
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("s22"),
        (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias("s12"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        F.col("s22") * dx * dx
        - 2 * F.col("s12") * dx * dy
        + F.col("s11") * dy * dy
    ) / (F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12"))
    return (
        ok.crossJoin(F.broadcast(mom))
        .select(
            F.col("d").alias("day"),
            F.round(d2, 4).alias("d2"),
            F.when(d2 > 5.991, 1).otherwise(0).alias("outlier"),
        )
        .orderBy("day")
    )


_CCC_SQL = f"""
    WITH daily AS ({_DAILY}),
    ok AS (SELECT * FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             AVG(x * x) - AVG(x) * AVG(x) AS sx2,
             AVG(y * y) - AVG(y) * AVG(y) AS sy2,
             AVG(x * y) - AVG(x) * AVG(y) AS sxy
      FROM ok
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sxy / SQRT(sx2 * sy2), 6) AS pearson_r,
           ROUND(2 * sxy / (sx2 + sy2 + (mx - my) * (mx - my)), 6) AS ccc,
           ROUND((2 * sxy / (sx2 + sy2 + (mx - my) * (mx - my)))
                 / (sxy / SQRT(sx2 * sy2)), 6) AS c_b
    FROM mom
"""


@register("ccc_events", _CCC_SQL)
def ccc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("x"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("y"),
    )
    ok = daily.where(F.col("x").isNotNull() & F.col("y").isNotNull())
    mom = ok.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("sx2"),
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("sy2"),
        (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias("sxy"),
    )
    ccc = (
        2
        * F.col("sxy")
        / (
            F.col("sx2")
            + F.col("sy2")
            + (F.col("mx") - F.col("my")) * (F.col("mx") - F.col("my"))
        )
    )
    r = F.col("sxy") / F.sqrt(F.col("sx2") * F.col("sy2"))
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc, 6).alias("ccc"),
        F.round(ccc / r, 6).alias("c_b"),
    )
