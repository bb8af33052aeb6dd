"""Hundred-seventy-third oracle-registry module: tail-aware
normality testing and moment-corrected quantiles.

  * anderson_darling_events — Anderson-Darling normality statistic
    for the 30 daily mean values: standardize by sample moments,
    A^2 = -n - (1/n) sum (2i-1)(ln F(z_(i)) + ln(1 - F(z_(n+1-i)))),
    with the small-sample correction A*^2 = A^2 (1 + 0.75/n +
    2.25/n^2).  The normal CDF uses the Abramowitz-Stegun 7.1.26
    rational erf approximation (|eps| < 1.5e-7), spelled out
    IDENTICALLY in both engines — the registry's answer to neither
    engine shipping erf.  AD weights the tails ~x2 harder than
    KS/Jarque-Bera, catching exactly the tail deviations that break
    k-sigma alerting.

  * cornish_fisher_events — Cornish-Fisher fourth-moment expansion
    of the 95% quantile of event value: from skewness g1 and excess
    kurtosis g2, z_cf = z + (z^2-1)g1/6 + (z^3-3z)g2/24 -
    (2z^3-5z)g1^2/36 at z = 1.645, reporting the moment-corrected
    VaR mu + z_cf * sd next to the naive Gaussian one and the exact
    empirical rank quantile — the standard risk-desk correction for
    skewed fat-tailed P&L, here a one-aggregate job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Abramowitz-Stegun 7.1.26 erf; Phi(z) = 0.5 (1 + erf(z/sqrt 2)).
_PHI_SQL = """(
  CASE WHEN {z} >= 0 THEN
    1 - 0.5 * (((((1.061405429 * (1 / (1 + 0.3275911 * ({z} / 1.4142135623730951)))
        - 1.453152027) * (1 / (1 + 0.3275911 * ({z} / 1.4142135623730951)))
        + 1.421413741) * (1 / (1 + 0.3275911 * ({z} / 1.4142135623730951)))
        - 0.284496736) * (1 / (1 + 0.3275911 * ({z} / 1.4142135623730951)))
        + 0.254829592) * (1 / (1 + 0.3275911 * ({z} / 1.4142135623730951))))
        * EXP(-({z} / 1.4142135623730951) * ({z} / 1.4142135623730951))
  ELSE
    0.5 * (((((1.061405429 * (1 / (1 + 0.3275911 * (-{z} / 1.4142135623730951)))
        - 1.453152027) * (1 / (1 + 0.3275911 * (-{z} / 1.4142135623730951)))
        + 1.421413741) * (1 / (1 + 0.3275911 * (-{z} / 1.4142135623730951)))
        - 0.284496736) * (1 / (1 + 0.3275911 * (-{z} / 1.4142135623730951)))
        + 0.254829592) * (1 / (1 + 0.3275911 * (-{z} / 1.4142135623730951))))
        * EXP(-({z} / 1.4142135623730951) * ({z} / 1.4142135623730951))
  END)"""


def _phi_col(z: Column) -> Column:
    az = F.abs(z) / 1.4142135623730951
    t = 1 / (1 + 0.3275911 * az)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    upper = 1 - 0.5 * poly * F.exp(-az * az)
    lower = 0.5 * poly * F.exp(-az * az)
    return F.when(z >= 0, upper).otherwise(lower)


_AD_SQL = f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS mu,
             SQRT((SUM(x * x) - COUNT(*) * AVG(x) * AVG(x))
                  / (COUNT(*) - 1)) AS sd
      FROM daily
    ),
    z AS (
      SELECT ROW_NUMBER() OVER (ORDER BY x, d) AS i,
             ROUND((x - m.mu) / m.sd, 6) AS z, m.n
      FROM daily CROSS JOIN mom m
    ),
    paired AS (
      SELECT a.i, a.n, a.z AS zi, b.z AS zr
      FROM z a JOIN z b ON b.i = a.n + 1 - a.i
    ),
    terms AS (
      SELECT n,
             (2 * i - 1)
               * (LN({_PHI_SQL.format(z='zi')})
                  + LN(1 - {_PHI_SQL.format(z='zr')})) AS t
      FROM paired
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           ROUND(-MAX(n) - SUM(t) / MAX(n), 6) AS a2,
           ROUND((-MAX(n) - SUM(t) / MAX(n))
                 * (1 + 0.75 / MAX(n) + 2.25 / (MAX(n) * MAX(n))), 6)
             AS a2_star
    FROM terms
"""


@register("anderson_darling_events", _AD_SQL)
def anderson_darling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    mom = daily.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("x") * F.col("x"))
                - F.count("*") * F.avg("x") * F.avg("x")
            )
            / (F.count("*") - 1)
        ).alias("sd"),
    )
    z = daily.crossJoin(F.broadcast(mom)).select(
        F.row_number().over(Window.orderBy("x", "d")).alias("i"),
        F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        "n",
    )
    a = z.alias("a")
    b = z.alias("b")
    paired = a.join(
        b, F.col("b.i") == F.col("a.n") + 1 - F.col("a.i")
    ).select(
        F.col("a.i").alias("i"),
        F.col("a.n").alias("n"),
        F.col("a.z").alias("zi"),
        F.col("b.z").alias("zr"),
    )
    terms = paired.select(
        "n",
        (
            (2 * F.col("i") - 1)
            * (
                F.log(_phi_col(F.col("zi")))
                + F.log(1 - _phi_col(F.col("zr")))
            )
        ).alias("t"),
    )
    a2 = -F.max("n") - F.sum("t") / F.max("n")
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.round(a2, 6).alias("a2"),
        F.round(
            a2
            * (
                1
                + 0.75 / F.max("n")
                + 2.25 / (F.max("n") * F.max("n"))
            ),
            6,
        ).alias("a2_star"),
    )


_CF_SQL = """
    WITH mom AS (
      SELECT COUNT(*) AS n, AVG(value) AS mu,
             SQRT(AVG(value * value) - AVG(value) * AVG(value)) AS sd,
             AVG(value * value * value) AS m3r,
             AVG(value * value * value * value) AS m4r
      FROM events
    ),
    shape AS (
      SELECT n, mu, sd,
             (m3r - 3 * mu * sd * sd - mu * mu * mu) / (sd * sd * sd) AS g1,
             (m4r - 4 * mu * m3r + 6 * mu * mu * (sd * sd + mu * mu)
              - 3 * mu * mu * mu * mu) / (sd * sd * sd * sd) - 3 AS g2
      FROM mom
    ),
    zcf AS (
      SELECT n, mu, sd, g1, g2,
             1.645 + (1.645 * 1.645 - 1) * g1 / 6
                   + (1.645 * 1.645 * 1.645 - 3 * 1.645) * g2 / 24
                   - (2 * 1.645 * 1.645 * 1.645 - 5 * 1.645) * g1 * g1 / 36
               AS z
      FROM shape
    ),
    emp AS (
      SELECT value AS q_emp FROM (
        SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
               COUNT(*) OVER () AS nn
        FROM events
      ) WHERE rn = CAST(CEIL(0.95 * nn) AS BIGINT)
    )
    SELECT CAST(z.n AS BIGINT) AS n,
           ROUND(z.g1, 6) AS skew,
           ROUND(z.g2, 6) AS ex_kurtosis,
           ROUND(z.z, 6) AS z_cf,
           ROUND(z.mu + 1.645 * z.sd, 4) AS var95_gauss,
           ROUND(z.mu + z.z * z.sd, 4) AS var95_cf,
           ROUND(e.q_emp, 4) AS var95_emp
    FROM zcf z CROSS JOIN emp e
"""


@register("cornish_fisher_events", _CF_SQL)
def cornish_fisher_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    mom = ev.agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mu"),
        F.sqrt(F.avg(v * v) - F.avg(v) * F.avg(v)).alias("sd"),
        F.avg(v * v * v).alias("m3r"),
        F.avg(v * v * v * v).alias("m4r"),
    )
    g1 = (
        F.col("m3r")
        - 3 * F.col("mu") * F.col("sd") * F.col("sd")
        - F.col("mu") * F.col("mu") * F.col("mu")
    ) / (F.col("sd") * F.col("sd") * F.col("sd"))
    g2 = (
        F.col("m4r")
        - 4 * F.col("mu") * F.col("m3r")
        + 6
        * F.col("mu")
        * F.col("mu")
        * (F.col("sd") * F.col("sd") + F.col("mu") * F.col("mu"))
        - 3 * F.col("mu") * F.col("mu") * F.col("mu") * F.col("mu")
    ) / (F.col("sd") * F.col("sd") * F.col("sd") * F.col("sd")) - 3
    shape = mom.select("n", "mu", "sd", g1.alias("g1"), g2.alias("g2"))
    zq = 1.645
    z = (
        zq
        + (zq * zq - 1) * F.col("g1") / 6
        + (zq * zq * zq - 3 * zq) * F.col("g2") / 24
        - (2 * zq * zq * zq - 5 * zq) * F.col("g1") * F.col("g1") / 36
    )
    zcf = shape.withColumn("z", z)
    from lnex_spark.operators.scalable_windows import attach_rank

    # distributed rank over ALL events (round-4 window audit)
    ranked = attach_rank(
        ev.select("value", "event_id"),
        [F.col("value").asc(), F.col("event_id").asc()],
        rank_col="rn",
    ).crossJoin(F.broadcast(ev.agg(F.count("*").alias("nn"))))
    emp = ranked.where(
        F.col("rn") == F.ceil(0.95 * F.col("nn")).cast("long")
    ).select(F.col("value").alias("q_emp"))
    return zcf.crossJoin(F.broadcast(emp)).select(
        F.col("n").cast("long").alias("n"),
        F.round("g1", 6).alias("skew"),
        F.round("g2", 6).alias("ex_kurtosis"),
        F.round("z", 6).alias("z_cf"),
        F.round(F.col("mu") + 1.645 * F.col("sd"), 4).alias("var95_gauss"),
        F.round(F.col("mu") + F.col("z") * F.col("sd"), 4).alias("var95_cf"),
        F.round("q_emp", 4).alias("var95_emp"),
    )
