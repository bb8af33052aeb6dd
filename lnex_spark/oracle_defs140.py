"""Hundred-fortieth oracle-registry module: time-series diagnostics
closing the whiteness / stationarity gaps of the autocorr / pacf /
variance-ratio suite —

  * ljung_box_events — the Ljung-Box portmanteau statistic
    Q = n(n+2) Σ_{k=1..5} r_k²/(n−k) over the daily event-count
    series, with the sample ACF from a day-index self-join (bounded:
    the joined relation is days × lags, never event-row-sized) and
    the textbook fixed-mean, fixed-denominator ACF definition shared
    verbatim by both engines.  Tests all lags jointly where
    autocorr_events reads one lag at a time — the whiteness check a
    residual series should pass after stl_lite / seasonal_residuals
    detrending.

  * dickey_fuller_events — the (non-augmented) Dickey-Fuller
    unit-root regression Δy_t = α + β·y_{t−1} + ε over the same
    daily series, β's t-statistic computed from closed-form OLS
    sums (Sxx, Sxy, RSS = Syy − β·Sxy, SE = s/√Sxx): the t ≪ 0
    reading is evidence of mean reversion, t ≈ 0 of a unit root
    (random-walk daily volume — which would invalidate every
    fixed-mean control chart in the registry).  One lag window over
    the bounded day table, then a single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY_SQL = """
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
"""

_LB_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, CAST(y AS DOUBLE) AS y
      FROM daily
    ),
    base AS (
      SELECT COUNT(*) AS n, AVG(y) AS ybar FROM idx
    ),
    denom AS (
      SELECT SUM(POW(i.y - b.ybar, 2)) AS s0, MAX(b.n) AS n,
             MAX(b.ybar) AS ybar
      FROM idx i CROSS JOIN base b
    ),
    acf AS (
      SELECT k.k,
             SUM((a.y - d.ybar) * (b.y - d.ybar)) / MAX(d.s0) AS r,
             MAX(d.n) AS n
      FROM (SELECT unnest(range(1, 6)) AS k) k
      JOIN idx a ON TRUE
      JOIN idx b ON b.t = a.t - k.k
      CROSS JOIN denom d
      GROUP BY k.k
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           ROUND(MAX(n) * (MAX(n) + 2.0)
                 * SUM(r * r / (n - k)), 6) AS q_lb,
           CAST(COUNT(*) AS BIGINT) AS h
    FROM acf
"""


@register("ljung_box_events", _LB_SQL)
def ljung_box_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("yl")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.col("yl").cast("double").alias("y"),
    )
    denom = idx.agg(
        F.count("*").alias("n"),
        F.avg("y").alias("ybar"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.count("*") * F.pow(F.avg("y"), 2)
        ).alias("s0"),
    )
    lags = idx.sparkSession.range(1, 6).select(F.col("id").alias("k"))
    a = idx.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = idx.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    acf = (
        lags.crossJoin(a)
        .join(b, F.col("tb") == F.col("ta") - F.col("k"))
        .crossJoin(F.broadcast(denom))
        .groupBy("k")
        .agg(
            (
                F.sum(
                    (F.col("ya") - F.col("ybar"))
                    * (F.col("yb") - F.col("ybar"))
                )
                / F.max("s0")
            ).alias("r"),
            F.max("n").alias("n"),
        )
    )
    return acf.agg(
        F.max("n").cast("long").alias("n"),
        F.round(
            F.max("n")
            * (F.max("n") + 2.0)
            * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("k"))),
            6,
        ).alias("q_lb"),
        F.count("*").cast("long").alias("h"),
    )


_DF_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, CAST(y AS DOUBLE) AS y
      FROM daily
    ),
    lagged AS (
      SELECT a.y - b.y AS d, b.y AS x
      FROM idx a JOIN idx b ON b.t = a.t - 1
    ),
    sums AS (
      SELECT COUNT(*) AS n, AVG(x) AS xbar, AVG(d) AS dbar,
             SUM(x * x) - COUNT(*) * POW(AVG(x), 2) AS sxx,
             SUM(x * d) - COUNT(*) * AVG(x) * AVG(d) AS sxy,
             SUM(d * d) - COUNT(*) * POW(AVG(d), 2) AS syy
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sxy / sxx, 6) AS beta,
           ROUND((sxy / sxx)
                 / SQRT(((syy - sxy * sxy / sxx) / (n - 2)) / sxx), 6)
             AS t_stat
    FROM sums
"""


@register("dickey_fuller_events", _DF_SQL)
def dickey_fuller_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("yl")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.col("yl").cast("double").alias("y"),
    )
    lagged = idx.select(
        "t",
        "y",
        F.lag("y").over(Window.orderBy("t")).alias("x"),
    ).filter(F.col("x").isNotNull()).select(
        (F.col("y") - F.col("x")).alias("d"), "x"
    )
    sums = lagged.agg(
        F.count("*").alias("n"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.pow(F.avg("x"), 2)).alias("sxx"),
        (F.sum(F.col("x") * F.col("d")) - F.count("*") * F.avg("x") * F.avg("d")).alias("sxy"),
        (F.sum(F.col("d") * F.col("d")) - F.count("*") * F.pow(F.avg("d"), 2)).alias("syy"),
    )
    beta = F.col("sxy") / F.col("sxx")
    return sums.select(
        F.col("n").cast("long").alias("n"),
        F.round(beta, 6).alias("beta"),
        F.round(
            beta
            / F.sqrt(
                (
                    (F.col("syy") - F.col("sxy") * F.col("sxy") / F.col("sxx"))
                    / (F.col("n") - 2)
                )
                / F.col("sxx")
            ),
            6,
        ).alias("t_stat"),
    )
