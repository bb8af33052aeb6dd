"""Hundred-ninety-seventh oracle-registry module: regression
adjustment done right — the partialling-out identity and the
sandwich variance that fixes what breusch_pagan_events diagnoses.

  * fwl_partialling_events — Frisch-Waugh-Lovell / DML-style
    partialling-out estimate of the value ~ props.k effect
    controlling for the hour-of-day confounder: residualize BOTH
    y = value and x = k on the hour index by closed-form OLS, then
    regress residual on residual.  Emits the naive (unadjusted)
    slope next to the partialled one and the exact FWL identity
    check vs the two-predictor normal-equation solve — the
    orthogonalization step at the heart of double machine learning,
    as three aggregate passes.

  * robust_se_events — White heteroskedasticity-robust (HC1)
    standard error for the daily-mean-vs-day-index slope:
    se_hc1^2 = n/(n-2) * sum(e_i^2 (x_i - xbar)^2) / Sxx^2 next to
    the classical s^2/Sxx, with their ratio.  Ratio far from 1 →
    the classical t-statistic (rolling_slope, influence) is
    mis-sized; this is the correction to quote when
    breusch_pagan_events fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FWL_SQL = """
    WITH base AS (
      SELECT value AS y,
             CAST(json_extract(props, '$.k') AS DOUBLE) AS x,
             CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS w
      FROM events
    ),
    m AS (
      SELECT COUNT(*) AS n,
             AVG(y) AS yb, AVG(x) AS xb, AVG(w) AS wb,
             SUM(w * w) - COUNT(*) * AVG(w) * AVG(w) AS sww,
             SUM(w * y) - COUNT(*) * AVG(w) * AVG(y) AS swy,
             SUM(w * x) - COUNT(*) * AVG(w) * AVG(x) AS swx,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy
      FROM base
    ),
    resid AS (
      SELECT b.y - m.yb - m.swy / m.sww * (b.w - m.wb) AS ry,
             b.x - m.xb - m.swx / m.sww * (b.w - m.wb) AS rx
      FROM base b CROSS JOIN m
    ),
    fwl AS (
      SELECT SUM(rx * ry) / SUM(rx * rx) AS theta FROM resid
    ),
    direct AS (
      -- two-predictor normal equations for y ~ x + w: identical by FWL
      SELECT (m.sww * m.sxy - m.swx * m.swy)
               / (m.sxx * m.sww - m.swx * m.swx) AS theta2,
             m.sxy / m.sxx AS naive
      FROM m
    )
    SELECT ROUND(d.naive, 8) AS naive_slope,
           ROUND(f.theta, 8) AS fwl_slope,
           ROUND(d.theta2, 8) AS normal_eq_slope,
           ROUND(ABS(f.theta - d.theta2), 10) AS fwl_identity_gap
    FROM fwl f CROSS JOIN direct d
"""


@register("fwl_partialling_events", _FWL_SQL)
def fwl_partialling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("y"),
        F.get_json_object("props", "$.k").cast("double").alias("x"),
        F.hour("ts").cast("double").alias("w"),
    )
    m = base.agg(
        F.count("*").alias("n"),
        F.avg("y").alias("yb"),
        F.avg("x").alias("xb"),
        F.avg("w").alias("wb"),
        (F.sum(F.col("w") * F.col("w")) - F.count("*") * F.avg("w") * F.avg("w")).alias("sww"),
        (F.sum(F.col("w") * F.col("y")) - F.count("*") * F.avg("w") * F.avg("y")).alias("swy"),
        (F.sum(F.col("w") * F.col("x")) - F.count("*") * F.avg("w") * F.avg("x")).alias("swx"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
    )
    resid = base.crossJoin(F.broadcast(m)).select(
        (
            F.col("y")
            - F.col("yb")
            - F.col("swy") / F.col("sww") * (F.col("w") - F.col("wb"))
        ).alias("ry"),
        (
            F.col("x")
            - F.col("xb")
            - F.col("swx") / F.col("sww") * (F.col("w") - F.col("wb"))
        ).alias("rx"),
    )
    fwl = resid.agg(
        (F.sum(F.col("rx") * F.col("ry")) / F.sum(F.col("rx") * F.col("rx"))).alias(
            "theta"
        )
    )
    direct = m.select(
        (
            (F.col("sww") * F.col("sxy") - F.col("swx") * F.col("swy"))
            / (F.col("sxx") * F.col("sww") - F.col("swx") * F.col("swx"))
        ).alias("theta2"),
        (F.col("sxy") / F.col("sxx")).alias("naive"),
    )
    return fwl.crossJoin(F.broadcast(direct)).select(
        F.round("naive", 8).alias("naive_slope"),
        F.round("theta", 8).alias("fwl_slope"),
        F.round("theta2", 8).alias("normal_eq_slope"),
        F.round(F.abs(F.col("theta") - F.col("theta2")), 10).alias(
            "fwl_identity_gap"
        ),
    )


_HC1_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    pts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS x, y
      FROM daily
    ),
    m AS (
      SELECT COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx
      FROM pts
    ),
    resid AS (
      SELECT p.x, m.xb, m.n, m.sxx,
             p.y - (m.yb - m.sxy / m.sxx * m.xb + m.sxy / m.sxx * p.x) AS e
      FROM pts p CROSS JOIN m
    ),
    v AS (
      SELECT MAX(n) AS n, MAX(sxx) AS sxx,
             SUM(e * e) / (MAX(n) - 2) AS s2,
             SUM(e * e * (x - xb) * (x - xb)) AS meat
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((SELECT sxy / sxx FROM m), 8) AS slope,
           ROUND(SQRT(s2 / sxx), 8) AS se_classic,
           ROUND(SQRT(CAST(n AS DOUBLE) / (n - 2) * meat / (sxx * sxx)), 8)
             AS se_hc1,
           ROUND(SQRT(CAST(n AS DOUBLE) / (n - 2) * meat / (sxx * sxx))
                 / SQRT(s2 / sxx), 6) AS hc1_ratio
    FROM v
"""


@register("robust_se_events", _HC1_SQL)
def robust_se_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    m = pts.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
    )
    slope = F.col("sxy") / F.col("sxx")
    resid = pts.crossJoin(F.broadcast(m)).select(
        "x",
        "xb",
        "n",
        "sxx",
        (F.col("sxy") / F.col("sxx")).alias("slope"),
        (
            F.col("y")
            - (F.col("yb") - slope * F.col("xb") + slope * F.col("x"))
        ).alias("e"),
    )
    v = resid.agg(
        F.max("n").alias("n"),
        F.max("sxx").alias("sxx"),
        F.max("slope").alias("slope"),
        (F.sum(F.col("e") * F.col("e")) / (F.max("n") - 2)).alias("s2"),
        F.sum(
            F.col("e")
            * F.col("e")
            * (F.col("x") - F.col("xb"))
            * (F.col("x") - F.col("xb"))
        ).alias("meat"),
    )
    se_hc1 = F.sqrt(
        F.col("n").cast("double")
        / (F.col("n") - 2)
        * F.col("meat")
        / (F.col("sxx") * F.col("sxx"))
    )
    se_cl = F.sqrt(F.col("s2") / F.col("sxx"))
    return v.select(
        F.col("n").cast("long").alias("n"),
        F.round("slope", 8).alias("slope"),
        F.round(se_cl, 8).alias("se_classic"),
        F.round(se_hc1, 8).alias("se_hc1"),
        F.round(se_hc1 / se_cl, 6).alias("hc1_ratio"),
    )
