"""Hundred-forty-third oracle-registry module: sequential randomness
and drift over the daily series — closing two monitoring gaps left
between cusum_events (known-target drift) and records_test_events
(record-breaking trend):

  * page_hinkley_events — the Page-Hinkley mean-shift detector over
    daily mean event values: m_t = Σ_{s≤t}(x_s − x̄_s − δ) with the
    *running* mean x̄_s (what distinguishes PH from CUSUM's fixed
    target), PH_t = m_t − min_{s≤t} m_s, alarm when PH_t > λ.
    Entirely cumulative windows over the bounded day table (running
    avg, running sum, running min — each one ordered pass); emits
    the max PH, its day index, and the alarm count at δ=0.005,
    λ=2.0.

  * runs_test_events — Wald-Wolfowitz runs test on the signs of
    (daily count − global median): R = 1 + #sign changes via a lag
    window, E[R] = 2n₁n₂/n + 1, Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)),
    z = (R − E)/√Var.  Median-equal days are dropped (the classical
    treatment).  Detects non-random clustering in time that a
    marginal test can never see — the day-level analogue of the
    digit-forensics ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PH_DELTA = 0.005
_PH_LAMBDA = 2.0

_PH_SQL = f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, AVG(value) AS x
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM daily
    ),
    runmean AS (
      SELECT t, x,
             AVG(x) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xbar_t
      FROM idx
    ),
    m AS (
      SELECT t,
             SUM(x - xbar_t - {_PH_DELTA}) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_t
      FROM runmean
    ),
    ph AS (
      SELECT t,
             m_t - MIN(m_t) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_t
      FROM m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(ph_t), 6) AS max_ph,
           CAST(MIN(CASE WHEN ph_t = (SELECT MAX(ph_t) FROM ph)
                    THEN t END) AS BIGINT) AS argmax_t,
           CAST(SUM(CASE WHEN ph_t > {_PH_LAMBDA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarms
    FROM ph
"""


@register("page_hinkley_events", _PH_SQL)
def page_hinkley_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.avg("value").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "x"
    )
    cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    runmean = idx.select("t", "x", F.avg("x").over(cum).alias("xbar_t"))
    m = runmean.select(
        "t",
        F.sum(F.col("x") - F.col("xbar_t") - _PH_DELTA).over(cum).alias("m_t"),
    )
    ph = m.select(
        "t", (F.col("m_t") - F.min("m_t").over(cum)).alias("ph_t")
    )
    mx = ph.agg(F.max("ph_t").alias("mxv"))
    return (
        ph.crossJoin(F.broadcast(mx))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.max("ph_t"), 6).alias("max_ph"),
            F.min(F.when(F.col("ph_t") == F.col("mxv"), F.col("t")))
            .cast("long")
            .alias("argmax_t"),
            F.sum(F.when(F.col("ph_t") > _PH_LAMBDA, 1).otherwise(0))
            .cast("long")
            .alias("n_alarms"),
        )
    )


_RUNS_SQL = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(y, 0.5) AS med FROM daily),
    signs AS (
      SELECT d.day, CASE WHEN d.y > m.med THEN 1 ELSE -1 END AS s
      FROM daily d CROSS JOIN med m
      WHERE d.y <> m.med
    ),
    lagged AS (
      SELECT s, LAG(s) OVER (ORDER BY day) AS prev FROM signs
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n2,
             1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                     THEN 1 ELSE 0 END) AS r
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS runs,
           ROUND((r - (2.0 * n1 * n2 / n + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (POW(n, 2) * (n - 1.0))), 6) AS z
    FROM agg
"""


@register("runs_test_events", _RUNS_SQL)
def runs_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("y")
    )
    med = daily.agg(F.expr("percentile(y, 0.5)").alias("med"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select(
            "day",
            F.when(F.col("y") > F.col("med"), 1).otherwise(-1).alias("s"),
        )
    )
    lagged = signs.select(
        "s", F.lag("s").over(Window.orderBy("day")).alias("prev")
    )
    agg = lagged.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("r"),
    )
    e_r = 2.0 * F.col("n1") * F.col("n2") / F.col("n") + 1
    var_r = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n"))
        / (F.pow("n", 2) * (F.col("n") - 1.0))
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.col("r").cast("long").alias("runs"),
        F.round((F.col("r") - e_r) / F.sqrt(var_r), 6).alias("z"),
    )
