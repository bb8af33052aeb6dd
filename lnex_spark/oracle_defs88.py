"""Eighty-eighth oracle-registry module: trend/seasonal decomposition
and experiment-assignment integrity.

  * stl_lite_events — an STL-flavored decomposition of the daily
    event-count series: centered 7-day moving-average trend (interior
    days only, so every window is full), weekday seasonal index =
    mean detrended value per weekday (datediff-mod-7 weekday, the
    dow-numbering-safe form), and the per-weekday residual variance
    left after removing both.  Extends seasonal_residuals_events
    (which z-scores within weekday) with the explicit
    trend-then-seasonal split every volume dashboard wants; integer
    daily counts make the trend window exact.

  * srm_check_events — the Sample Ratio Mismatch guardrail run
    BEFORE any A/B readout: chi-square of observed arm counts vs the
    designed 50/50 split, for (a) the healthy md5 coin the
    permutation/A-B ops use and (b) a deliberately skewed 7/16
    assignment that must trip the check.  chi2 = (na-nb)²/N from
    exact integer counts; flag at the 3.841 (df=1, 5%) threshold.
    An SRM fires when assignment, logging, or filtering is broken —
    the cheapest bug detector in experimentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_STL_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT day, y,
             AVG(y * 1.0) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wn
      FROM daily
    ),
    interior AS (
      SELECT CAST(datediff('day', DATE '2024-01-01', day) % 7 AS INTEGER) AS wd,
             y - trend AS detrended
      FROM win WHERE wn = 7
    ),
    seasonal AS (
      SELECT wd, COUNT(*) AS n_days, AVG(detrended) AS s FROM interior GROUP BY wd
    )
    SELECT i.wd, s.n_days,
           ROUND(s.s, 6) AS seasonal_idx,
           ROUND(AVG((i.detrended - s.s) * (i.detrended - s.s)), 6) AS resid_var
    FROM interior i JOIN seasonal s ON i.wd = s.wd
    GROUP BY i.wd, s.n_days, s.s
"""


@register("stl_lite_events", _STL_SQL)
def stl_lite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.count("*").alias("y"))
    # single ordered window over ~30 daily rows — bounded by the calendar
    w = Window.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "y",
        F.avg(F.col("y") * 1.0).over(w).alias("trend"),
        F.count("*").over(w).alias("wn"),
    )
    interior = win.filter(F.col("wn") == 7).select(
        (
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7
        )
        .cast("int")
        .alias("wd"),
        (F.col("y") - F.col("trend")).alias("detrended"),
    )
    seasonal = interior.groupBy("wd").agg(
        F.count("*").alias("n_days"), F.avg("detrended").alias("s")
    )
    return (
        interior.join(seasonal, "wd")
        .groupBy("wd", "n_days", "s")
        .agg(
            F.round(
                F.avg(
                    (F.col("detrended") - F.col("s")) * (F.col("detrended") - F.col("s"))
                ),
                6,
            ).alias("resid_var")
        )
        .select(
            "wd", "n_days", F.round("s", 6).alias("seasonal_idx"), "resid_var"
        )
    )


_SRM_SQL = """
    WITH coins AS (
      SELECT CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 16 AS b
      FROM events
    ),
    assigns AS (
      SELECT 'healthy_50_50' AS assignment,
             CAST(SUM(CASE WHEN b % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN b % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM coins
      UNION ALL
      SELECT 'skewed_7_16',
             CAST(SUM(CASE WHEN b < 7 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN b >= 7 THEN 1 ELSE 0 END) AS BIGINT)
      FROM coins
    )
    SELECT assignment, na, nb,
           ROUND((na - nb) * (na - nb) * 1.0 / (na + nb), 6) AS chi2,
           CAST((na - nb) * (na - nb) * 1.0 / (na + nb) > 3.841 AS INTEGER)
             AS srm_flag
    FROM assigns
"""


@register("srm_check_events", _SRM_SQL)
def srm_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    coins = ev.select(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(16),
        ).alias("b")
    )

    def row(label, cond_a):
        return coins.agg(
            F.lit(label).alias("assignment"),
            F.sum(F.when(cond_a, 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(~cond_a, 1).otherwise(0)).cast("long").alias("nb"),
        )

    assigns = row("healthy_50_50", F.col("b") % 2 == 0).unionByName(
        row("skewed_7_16", F.col("b") < 7)
    )
    chi2 = (F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb")) * 1.0 / (
        F.col("na") + F.col("nb")
    )
    return assigns.select(
        "assignment",
        "na",
        "nb",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).cast("int").alias("srm_flag"),
    )
