"""Hundred-seventy-second oracle-registry module: power-law scaling
of fluctuations and saturating-growth forecasting.

  * taylors_law_events — Taylor's power law across the
    (event_type × day) panel: each unit contributes the mean and
    variance of its per-minute counts; regress ln(var) on ln(mean)
    over all units.  Slope 1 → Poisson arrivals everywhere, slope 2
    → multiplicative/clumped; the scaling exponent tells you how
    alert thresholds must scale with traffic volume (a fixed
    k-sigma band is only valid if b ≈ 1).  The cross-sectional
    companion of the Fano factor in hawkes_branching_events.

  * gompertz_growth_events — Gompertz saturation fit of the
    cumulative distinct-user curve: first-seen day per user →
    cumulative adopters U_t (a cumsum, not a rolling COUNT
    DISTINCT), ceiling N_max = 1.05 * final U ROUNDED to 2, then
    the linearization ln(-ln(U_t/N_max)) = ln a - b t fit by
    closed-form OLS, reporting a, b, fit R^2 and the projected day
    index at 99% of ceiling t* = (ln a - ln(-ln .99))/b.  The
    adoption-forecast readout on top of new_users_curve_events'
    raw curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TAYLOR_SQL = """
    WITH bins AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             date_trunc('minute', ts) AS m, COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    units AS (
      SELECT event_type, d, AVG(c) AS mu,
             AVG(CAST(c AS DOUBLE) * c) - AVG(c) * AVG(c) AS v
      FROM bins GROUP BY 1, 2
    ),
    xy AS (
      SELECT LN(mu) AS x, LN(v) AS y FROM units WHERE v > 0 AND mu > 0
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(y * y) - COUNT(*) * AVG(y) * AVG(y) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_units,
           ROUND(sxy / sxx, 6) AS taylor_b,
           ROUND(yb - sxy / sxx * xb, 6) AS ln_a,
           ROUND(sxy * sxy / (sxx * syy), 6) AS r2
    FROM mom WHERE sxx > 0 AND syy > 0
"""


@register("taylors_law_events", _TAYLOR_SQL)
def taylors_law_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.date_trunc("minute", "ts").alias("m"),
    ).agg(F.count("*").alias("c"))
    units = bins.groupBy("event_type", "d").agg(
        F.avg("c").alias("mu"),
        (
            F.avg(F.col("c").cast("double") * F.col("c"))
            - F.avg("c") * F.avg("c")
        ).alias("v"),
    )
    xy = units.where((F.col("v") > 0) & (F.col("mu") > 0)).select(
        F.log("mu").alias("x"), F.log("v").alias("y")
    )
    mom = xy.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("y") * F.col("y")) - F.count("*") * F.avg("y") * F.avg("y")).alias("syy"),
    )
    mom = mom.where((F.col("sxx") > 0) & (F.col("syy") > 0))
    slope = F.col("sxy") / F.col("sxx")
    return mom.select(
        F.col("n").cast("long").alias("n_units"),
        F.round(slope, 6).alias("taylor_b"),
        F.round(F.col("yb") - slope * F.col("xb"), 6).alias("ln_a"),
        F.round(
            F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy")), 6
        ).alias("r2"),
    )


_GOMPERTZ_SQL = """
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('hour', ts)) AS d0
      FROM events GROUP BY user_id
    ),
    daily_new AS (
      SELECT d0 AS d, COUNT(*) AS nu FROM first_seen GROUP BY d0
    ),
    curve AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS t,
             SUM(nu) OVER (ORDER BY d) AS u
      FROM daily_new
    ),
    cap AS (
      SELECT CAST(ROUND(1.05 * MAX(u), 2) AS DOUBLE) AS nmax FROM curve
    ),
    xy AS (
      SELECT CAST(t AS DOUBLE) AS x,
             LN(-LN(u / (SELECT nmax FROM cap))) AS y
      FROM curve
      WHERE u < (SELECT nmax FROM cap)
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(y * y) - COUNT(*) * AVG(y) * AVG(y) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           (SELECT nmax FROM cap) AS nmax,
           ROUND(EXP(yb - sxy / sxx * xb), 6) AS a,
           ROUND(-(sxy / sxx), 6) AS b,
           ROUND(sxy * sxy / (sxx * syy), 6) AS r2,
           ROUND(((yb - sxy / sxx * xb) - LN(-LN(0.99)))
                 / (-(sxy / sxx)), 2) AS t_99pct
    FROM mom WHERE sxx > 0 AND syy > 0
"""


@register("gompertz_growth_events", _GOMPERTZ_SQL)
def gompertz_growth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("d0")
    )
    daily_new = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("nu")
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily_new.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"),
        F.sum("nu").over(wc).alias("u"),
    )
    cap = curve.agg(F.round(1.05 * F.max("u"), 2).alias("nmax"))
    xy = (
        curve.crossJoin(F.broadcast(cap))
        .where(F.col("u") < F.col("nmax"))
        .select(
            F.col("t").cast("double").alias("x"),
            F.log(-F.log(F.col("u") / F.col("nmax"))).alias("y"),
        )
    )
    mom = xy.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y")).alias("sxy"),
        (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("y") * F.col("y")) - F.count("*") * F.avg("y") * F.avg("y")).alias("syy"),
    )
    mom = mom.where((F.col("sxx") > 0) & (F.col("syy") > 0))
    slope = F.col("sxy") / F.col("sxx")
    icpt = F.col("yb") - slope * F.col("xb")
    import math

    return mom.crossJoin(F.broadcast(cap)).select(
        F.col("n").cast("long").alias("n_hours"),
        "nmax",
        F.round(F.exp(icpt), 6).alias("a"),
        F.round(-slope, 6).alias("b"),
        F.round(
            F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy")), 6
        ).alias("r2"),
        F.round((icpt - math.log(-math.log(0.99))) / (-slope), 2).alias(
            "t_99pct"
        ),
    )
