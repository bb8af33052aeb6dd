"""Hundred-eighty-third oracle-registry module: structural-break
detection in the REGRESSION sense — completing the changepoint suite
(mean shifts: cusum/changepoint/page_hinkley) with slope breaks and
variance breaks.

  * chow_test_events — Chow test for a structural break of the
    daily-mean-vs-day-index OLS at mid-month: pooled SSE vs the sum
    of the two segment SSEs (each fit closed-form), F = ((SSE_p -
    SSE_1 - SSE_2)/k) / ((SSE_1 + SSE_2)/(n - 2k)) with k = 2
    parameters.  Detects "the TREND changed" where a mean-shift
    detector sees nothing (same average, different slope) — the
    regression twin of did_events' pre/post logic.

  * cusum_squares_events — Brown-Durbin-Evans CUSUM-of-squares over
    the residuals of the full-sample daily OLS: S_t = cumsum(e^2) /
    sum(e^2) plotted against t/n, reporting the maximum deviation
    max|S_t - t/n|, its day, and the 95% crossing flag (approximate
    boundary 0.948/sqrt(n) + ... simplified to c = 1.36/sqrt(n),
    the KS-style constant).  Fires on VARIANCE regime changes —
    volatility bursts that leave the mean and slope untouched,
    invisible to both cusum_events and the Chow test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY_XY = """
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS x, y
      FROM (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               ROUND(AVG(value), 6) AS y
        FROM events GROUP BY 1
      )
"""

_SSE = """
      SELECT COUNT(*) AS n,
             (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y))
             - POW(SUM(x * y) - COUNT(*) * AVG(x) * AVG(y), 2)
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS sse
"""


_CHOW_SQL = f"""
    WITH pts AS ({_DAILY_XY}),
    half AS (SELECT CAST(MAX(x) / 2 AS DOUBLE) AS h FROM pts),
    pooled AS ({_SSE} FROM pts),
    seg1 AS ({_SSE} FROM pts WHERE x <= (SELECT h FROM half)),
    seg2 AS ({_SSE} FROM pts WHERE x > (SELECT h FROM half))
    SELECT CAST(p.n AS BIGINT) AS n,
           ROUND(p.sse, 6) AS sse_pooled,
           ROUND(s1.sse, 6) AS sse_seg1,
           ROUND(s2.sse, 6) AS sse_seg2,
           ROUND(((p.sse - s1.sse - s2.sse) / 2)
                 / ((s1.sse + s2.sse) / (p.n - 4)), 6) AS chow_f,
           CAST(2 AS BIGINT) AS df1,
           CAST(p.n - 4 AS BIGINT) AS df2
    FROM pooled p CROSS JOIN seg1 s1 CROSS JOIN seg2 s2
"""


def _xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    return daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("x"),
        "y",
    )


def _sse(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count("*").alias("n"),
        (
            (
                F.sum(F.col("y") * F.col("y"))
                - F.count("*") * F.avg("y") * F.avg("y")
            )
            - F.pow(
                F.sum(F.col("x") * F.col("y"))
                - F.count("*") * F.avg("x") * F.avg("y"),
                2,
            )
            / (
                F.sum(F.col("x") * F.col("x"))
                - F.count("*") * F.avg("x") * F.avg("x")
            )
        ).alias("sse"),
    )


@register("chow_test_events", _CHOW_SQL)
def chow_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _xy(spark, sf_dir)
    h = pts.agg((F.max("x") / 2).alias("h"))
    withh = pts.crossJoin(F.broadcast(h))
    pooled = _sse(pts).select(
        F.col("n").alias("np"), F.col("sse").alias("ssep")
    )
    seg1 = _sse(withh.where(F.col("x") <= F.col("h"))).select(
        F.col("sse").alias("sse1")
    )
    seg2 = _sse(withh.where(F.col("x") > F.col("h"))).select(
        F.col("sse").alias("sse2")
    )
    return (
        pooled.crossJoin(F.broadcast(seg1))
        .crossJoin(F.broadcast(seg2))
        .select(
            F.col("np").cast("long").alias("n"),
            F.round("ssep", 6).alias("sse_pooled"),
            F.round("sse1", 6).alias("sse_seg1"),
            F.round("sse2", 6).alias("sse_seg2"),
            F.round(
                ((F.col("ssep") - F.col("sse1") - F.col("sse2")) / 2)
                / ((F.col("sse1") + F.col("sse2")) / (F.col("np") - 4)),
                6,
            ).alias("chow_f"),
            F.lit(2).cast("long").alias("df1"),
            (F.col("np") - 4).cast("long").alias("df2"),
        )
    )


_CUSUMSQ_SQL = f"""
    WITH pts AS ({_DAILY_XY}),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx
      FROM pts
    ),
    resid AS (
      SELECT p.x,
             POW(p.y - (m.yb - m.sxy / m.sxx * m.xb + m.sxy / m.sxx * p.x),
                 2) AS e2,
             m.n
      FROM pts p CROSS JOIN mom m
    ),
    cum AS (
      SELECT x, n,
             SUM(e2) OVER (ORDER BY x) / SUM(e2) OVER () AS s,
             (x + 1) / n AS frac
      FROM resid
    ),
    dev AS (
      SELECT x, n, ABS(s - frac) AS dev FROM cum
    ),
    top AS (
      SELECT n, x AS at_x, dev FROM dev ORDER BY dev DESC, x LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(at_x AS BIGINT) AS break_day_idx,
           ROUND(dev, 6) AS max_dev,
           ROUND(1.36 / SQRT(n), 6) AS crit95,
           CASE WHEN dev > 1.36 / SQRT(n) THEN 1 ELSE 0 END AS variance_break
    FROM top
"""


@register("cusum_squares_events", _CUSUMSQ_SQL)
def cusum_squares_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _xy(spark, sf_dir)
    mom = pts.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
    )
    slope = F.col("sxy") / F.col("sxx")
    resid = pts.crossJoin(F.broadcast(mom)).select(
        "x",
        "n",
        F.pow(
            F.col("y")
            - (F.col("yb") - slope * F.col("xb") + slope * F.col("x")),
            2,
        ).alias("e2"),
    )
    wcur = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = resid.select(
        "x",
        "n",
        (F.sum("e2").over(wcur) / F.sum("e2").over(wall)).alias("s"),
        ((F.col("x") + 1) / F.col("n")).alias("frac"),
    )
    dev = cum.select("x", "n", F.abs(F.col("s") - F.col("frac")).alias("dev"))
    top = dev.orderBy(F.desc("dev"), "x").limit(1)
    return top.select(
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("break_day_idx"),
        F.round("dev", 6).alias("max_dev"),
        F.round(1.36 / F.sqrt(F.col("n")), 6).alias("crit95"),
        F.when(F.col("dev") > 1.36 / F.sqrt(F.col("n")), 1)
        .otherwise(0)
        .alias("variance_break"),
    )
