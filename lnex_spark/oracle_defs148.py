"""Hundred-forty-eighth oracle-registry module: the classical
parametric ANOVA and per-point regression influence diagnostics —
closing the inference toolkit around the rank/robust tests already
verified.

  * anova_f_events — one-way ANOVA of value across event types from
    a single raw-moment aggregate (per group n, sum, sum-of-squares;
    SSB = sum s_g^2/n_g - S^2/N, SSW = sum(ss_g - s_g^2/n_g)),
    F = (SSB/(k-1))/(SSW/(N-k)) and eta^2 = SSB/(SSB+SSW).  The
    parametric sibling of kruskal_wallis_events (rank form) and
    levene_bf_events (its variance-homogeneity precondition); Tukey
    HSD (tukey_hsd_events) is its post-hoc.  SS rounded to 2 (abs
    error from engine-order double summation ~1e-6 at this scale),
    ratios to 6.

  * influence_events — leverage / studentized residuals / Cook's
    distance for the daily-mean-vs-day simple regression: daily
    means ROUNDED first (identical summands on both engines, cusum
    discipline), then closed-form OLS from raw moments,
    h_i = 1/n + (x_i-xbar)^2/Sxx, t_i = r_i/(s*sqrt(1-h_i)),
    D_i = r_i^2/(2 s^2) * h_i/(1-h_i)^2.  The per-POINT completion
    of the residual diagnostics suite (durbin_watson_events tests
    the residual series; this says which days move the fit) —
    what an automated trend monitor checks before believing a slope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ANOVA_SQL = """
    WITH g AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s,
             SUM(value * value) AS ss
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n) AS nn, SUM(s) AS stot, COUNT(*) AS k,
             SUM(s * s / n) AS sb_raw, SUM(ss - s * s / n) AS ssw
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
           ROUND(sb_raw - stot * stot / nn, 2) AS ss_between,
           ROUND(ssw, 2) AS ss_within,
           ROUND(((sb_raw - stot * stot / nn) / (k - 1))
                 / (ssw / (nn - k)), 6) AS f_stat,
           ROUND((sb_raw - stot * stot / nn)
                 / (sb_raw - stot * stot / nn + ssw), 6) AS eta_sq
    FROM tot
"""


@register("anova_f_events", _ANOVA_SQL)
def anova_f_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.count("*").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb_raw"),
        F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias(
            "ssw"
        ),
    )
    ssb = F.col("sb_raw") - F.col("stot") * F.col("stot") / F.col("nn")
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("nn").cast("long").alias("n"),
        F.round(ssb, 2).alias("ss_between"),
        F.round(F.col("ssw"), 2).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(ssb / (ssb + F.col("ssw")), 6).alias("eta_sq"),
    )


_INFLUENCE_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    xy AS (
      SELECT d, y,
             CAST(date_diff('day', (SELECT MIN(d) FROM daily), d) AS DOUBLE)
               AS x
      FROM daily
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS xbar, AVG(y) AS ybar,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy
      FROM xy
    ),
    fit AS (
      SELECT x.d, x.x, x.y, m.n, m.xbar, m.sxx,
             x.y - (m.ybar - m.sxy / m.sxx * m.xbar
                    + m.sxy / m.sxx * x.x) AS r,
             1.0 / m.n + (x.x - m.xbar) * (x.x - m.xbar) / m.sxx AS h
      FROM xy x CROSS JOIN mom m
    ),
    mse AS (
      SELECT SUM(r * r) / (MAX(n) - 2) AS s2 FROM fit
    )
    SELECT f.d AS day, ROUND(f.y, 6) AS y,
           ROUND(f.h, 6) AS leverage,
           ROUND(f.r, 6) AS residual,
           ROUND(f.r / SQRT(m.s2 * (1 - f.h)), 6) AS studentized,
           ROUND(f.r * f.r / (2 * m.s2) * f.h / ((1 - f.h) * (1 - f.h)), 6)
             AS cooks_d
    FROM fit f CROSS JOIN mse m
    ORDER BY day
"""


@register("influence_events", _INFLUENCE_SQL)
def influence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    mind = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(mind)).select(
        "d", "y", F.datediff("d", "d0").cast("double").alias("x")
    )
    mom = xy.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
        (
            F.sum(F.col("x") * F.col("x"))
            - F.count("*") * F.avg("x") * F.avg("x")
        ).alias("sxx"),
        (
            F.sum(F.col("x") * F.col("y"))
            - F.count("*") * F.avg("x") * F.avg("y")
        ).alias("sxy"),
    )
    slope = F.col("sxy") / F.col("sxx")
    fit = xy.crossJoin(F.broadcast(mom)).select(
        "d",
        "x",
        "y",
        "n",
        "xbar",
        "sxx",
        (
            F.col("y")
            - (F.col("ybar") - slope * F.col("xbar") + slope * F.col("x"))
        ).alias("r"),
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("xbar"))
            * (F.col("x") - F.col("xbar"))
            / F.col("sxx")
        ).alias("h"),
    )
    mse = fit.agg(
        (F.sum(F.col("r") * F.col("r")) / (F.max("n") - 2)).alias("s2")
    )
    return (
        fit.crossJoin(F.broadcast(mse))
        .select(
            F.col("d").alias("day"),
            F.round("y", 6).alias("y"),
            F.round("h", 6).alias("leverage"),
            F.round("r", 6).alias("residual"),
            F.round(
                F.col("r") / F.sqrt(F.col("s2") * (1 - F.col("h"))), 6
            ).alias("studentized"),
            F.round(
                F.col("r")
                * F.col("r")
                / (2 * F.col("s2"))
                * F.col("h")
                / ((1 - F.col("h")) * (1 - F.col("h"))),
                6,
            ).alias("cooks_d"),
        )
        .orderBy("day")
    )
