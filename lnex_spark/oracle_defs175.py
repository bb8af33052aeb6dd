"""Hundred-seventy-fifth oracle-registry module: nonparametric trend
smoothing and residual-variance diagnostics for the daily series.

  * kernel_smoother_events — Gaussian-kernel regression of daily
    mean value on day index at bandwidth h = 3 days, BOTH orders:
    Nadaraya-Watson (degree 0, the kernel-weighted mean) and local
    LINEAR (degree 1 — closed-form weighted OLS per target point,
    which kills NW's notorious boundary bias: compare the two
    columns at the edges).  An all-pairs day×day kernel matrix is a
    30x30 join — constant in event volume because it runs on the
    daily rollup.  The trend extractor for plots and anomaly
    baselines where a global line (influence_events) underfits.

  * breusch_pagan_events — Breusch-Pagan heteroscedasticity test on
    the daily-mean-vs-day OLS: regress squared residuals on the day
    index, LM = n * R^2 ~ chi2(1) under homoscedasticity.  If it
    fires, the OLS standard errors in rolling_slope / influence are
    wrong and robust (White) errors are needed — the
    variance-stability sibling of durbin_watson's independence
    check, closing the OLS-assumption audit triplet
    (normality = jarque_bera, independence = DW, homoscedasticity =
    BP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_H = 3.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_KS_SQL = f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    pts AS (
      SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS x, y
      FROM daily
    ),
    pairs AS (
      SELECT t.d, t.x AS x0,
             s.x, s.y,
             EXP(-(s.x - t.x) * (s.x - t.x)
                 / (2 * {_H!r} * {_H!r})) AS w
      FROM pts t CROSS JOIN pts s
    ),
    fit AS (
      SELECT d, x0,
             SUM(w * y) / SUM(w) AS nw,
             SUM(w) AS s0, SUM(w * (x - x0)) AS s1,
             SUM(w * (x - x0) * (x - x0)) AS s2,
             SUM(w * y) AS t0, SUM(w * (x - x0) * y) AS t1
      FROM pairs GROUP BY d, x0
    )
    SELECT d AS day,
           ROUND(nw, 6) AS nadaraya_watson,
           ROUND((s2 * t0 - s1 * t1) / (s0 * s2 - s1 * s1), 6)
             AS local_linear
    FROM fit
    ORDER BY day
"""


@register("kernel_smoother_events", _KS_SQL)
def kernel_smoother_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    pts = daily.select(
        "d",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("x"),
        "y",
    )
    t = pts.select(F.col("d"), F.col("x").alias("x0"))
    s = pts.select(F.col("x"), F.col("y"))
    w = F.exp(
        -(F.col("x") - F.col("x0"))
        * (F.col("x") - F.col("x0"))
        / (2 * _H * _H)
    )
    pairs = t.crossJoin(s).select(
        "d", "x0", "x", "y", w.alias("w")
    )
    dx = F.col("x") - F.col("x0")
    fit = pairs.groupBy("d", "x0").agg(
        (F.sum(F.col("w") * F.col("y")) / F.sum("w")).alias("nw"),
        F.sum("w").alias("s0"),
        F.sum(F.col("w") * dx).alias("s1"),
        F.sum(F.col("w") * dx * dx).alias("s2"),
        F.sum(F.col("w") * F.col("y")).alias("t0"),
        F.sum(F.col("w") * dx * F.col("y")).alias("t1"),
    )
    return fit.select(
        F.col("d").alias("day"),
        F.round("nw", 6).alias("nadaraya_watson"),
        F.round(
            (F.col("s2") * F.col("t0") - F.col("s1") * F.col("t1"))
            / (F.col("s0") * F.col("s2") - F.col("s1") * F.col("s1")),
            6,
        ).alias("local_linear"),
    ).orderBy("day")


_BP_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM daily_src GROUP BY 1
    ),
    pts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS x, y
      FROM daily
    ),
    m1 AS (
      SELECT COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx
      FROM pts
    ),
    resid AS (
      SELECT p.x,
             POW(p.y - (m.yb - m.sxy / m.sxx * m.xb + m.sxy / m.sxx * p.x),
                 2) AS e2
      FROM pts p CROSS JOIN m1 m
    ),
    m2 AS (
      SELECT COUNT(*) AS n,
             SUM(x * e2) - COUNT(*) * AVG(x) * AVG(e2) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(e2 * e2) - COUNT(*) * AVG(e2) * AVG(e2) AS syy
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sxy * sxy / (sxx * syy), 6) AS r2_aux,
           ROUND(n * sxy * sxy / (sxx * syy), 6) AS bp_lm,
           CAST(1 AS BIGINT) AS df
    FROM m2
"""


@register("breusch_pagan_events", _BP_SQL.replace("daily_src", "events"))
def breusch_pagan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    pts = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("x"),
        "y",
    )
    m1 = pts.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
    )
    slope = F.col("sxy") / F.col("sxx")
    resid = pts.crossJoin(F.broadcast(m1)).select(
        "x",
        F.pow(
            F.col("y")
            - (F.col("yb") - slope * F.col("xb") + slope * F.col("x")),
            2,
        ).alias("e2"),
    )
    m2 = resid.agg(
        F.count("*").alias("n"),
        (F.sum(F.col("x") * F.col("e2")) - F.count("*") * F.avg("x") * F.avg("e2")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("e2") * F.col("e2")) - F.count("*") * F.avg("e2") * F.avg("e2")).alias("syy"),
    )
    r2 = F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy"))
    return m2.select(
        F.col("n").cast("long").alias("n"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(F.col("n") * r2, 6).alias("bp_lm"),
        F.lit(1).cast("long").alias("df"),
    )
