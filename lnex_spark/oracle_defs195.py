"""Hundred-ninety-fifth oracle-registry module: panel-based causal
designs — the synthetic-control and event-study readouts that
complete the did/cuped/psm suite for time-indexed interventions.

  * synthetic_control_events — vertical-regression synthetic control
    with a pseudo-intervention at day 21: for each candidate
    "treated" series (purchase, and the two placebos click / view —
    running every placebo IS the inference), fit its pre-period
    (days 1..20) daily means on the other two series by closed-form
    two-predictor OLS, then extrapolate the synthetic counterfactual
    into days 21..30.  Reports pre-RMSE (fit quality gate) and the
    mean post-period gap; a real effect requires the treated gap to
    dwarf every placebo gap — here all ≈ 0 by construction.

  * event_study_events — dynamic event-study coefficients around
    day 15: treated = purchase, control = click, outcome gap =
    daily mean difference normalized so the tau = -1 coefficient is
    0 (the standard identification); one row per relative day
    tau = -5..+5 with the running pre-trend mean for the
    parallel-trends eyeball test.  The picture every DiD should
    publish before its single number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY3 = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             EXTRACT(day FROM date_trunc('day', ts)) AS dom,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
               AS p,
             ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
               AS c,
             ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6)
               AS v
      FROM events GROUP BY 1, 2
"""


def _sc_unit_sql(y: str, x1: str, x2: str, unit: str) -> str:
    return f"""
    SELECT '{unit}' AS unit, fit.pre_rmse, post.gap AS post_effect
    FROM (
      SELECT SQRT(AVG(POW(d.{y} - (m.b0 + m.b1 * d.{x1} + m.b2 * d.{x2}),
                          2))) AS pre_rmse
      FROM daily d CROSS JOIN mom_{unit} m WHERE d.dom <= 20
    ) fit CROSS JOIN (
      SELECT AVG(d.{y} - (m.b0 + m.b1 * d.{x1} + m.b2 * d.{x2})) AS gap
      FROM daily d CROSS JOIN mom_{unit} m WHERE d.dom > 20
    ) post"""


def _mom_sql(y: str, x1: str, x2: str, unit: str) -> str:
    return f"""mom_{unit} AS (
      SELECT (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2,
             yb - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * x1b
                - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * x2b
               AS b0
      FROM (
        SELECT AVG({y}) AS yb, AVG({x1}) AS x1b, AVG({x2}) AS x2b,
               SUM({x1} * {x1}) - COUNT(*) * AVG({x1}) * AVG({x1}) AS s11,
               SUM({x2} * {x2}) - COUNT(*) * AVG({x2}) * AVG({x2}) AS s22,
               SUM({x1} * {x2}) - COUNT(*) * AVG({x1}) * AVG({x2}) AS s12,
               SUM({x1} * {y}) - COUNT(*) * AVG({x1}) * AVG({y}) AS s1y,
               SUM({x2} * {y}) - COUNT(*) * AVG({x2}) * AVG({y}) AS s2y
        FROM daily WHERE dom <= 20
      )
    )"""


_SC_SQL = (
    "    WITH daily AS ("
    + _DAILY3
    + "),\n    "
    + _mom_sql("p", "c", "v", "purchase")
    + ",\n    "
    + _mom_sql("c", "p", "v", "click")
    + ",\n    "
    + _mom_sql("v", "p", "c", "view")
    + "\n    SELECT unit, ROUND(pre_rmse, 6) AS pre_rmse,"
    + " ROUND(post_effect, 6) AS post_effect FROM ("
    + _sc_unit_sql("p", "c", "v", "purchase")
    + "\n    UNION ALL "
    + _sc_unit_sql("c", "p", "v", "click")
    + "\n    UNION ALL "
    + _sc_unit_sql("v", "p", "c", "view")
    + "\n    ) ORDER BY unit"
)


@register("synthetic_control_events", _SC_SQL)
def synthetic_control_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.dayofmonth(F.date_trunc("day", "ts")).alias("dom"),
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("p"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("c"),
        F.round(
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 6
        ).alias("v"),
    )

    def unit(y: str, x1: str, x2: str, name: str) -> DataFrame:
        pre = daily.where(F.col("dom") <= 20)
        mom = pre.agg(
            F.avg(y).alias("yb"),
            F.avg(x1).alias("x1b"),
            F.avg(x2).alias("x2b"),
            (F.sum(F.col(x1) * F.col(x1)) - F.count("*") * F.avg(x1) * F.avg(x1)).alias("s11"),
            (F.sum(F.col(x2) * F.col(x2)) - F.count("*") * F.avg(x2) * F.avg(x2)).alias("s22"),
            (F.sum(F.col(x1) * F.col(x2)) - F.count("*") * F.avg(x1) * F.avg(x2)).alias("s12"),
            (F.sum(F.col(x1) * F.col(y)) - F.count("*") * F.avg(x1) * F.avg(y)).alias("s1y"),
            (F.sum(F.col(x2) * F.col(y)) - F.count("*") * F.avg(x2) * F.avg(y)).alias("s2y"),
        )
        det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
        b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
        b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
        coefs = mom.select(
            b1.alias("b1"),
            b2.alias("b2"),
            (F.col("yb") - b1 * F.col("x1b") - b2 * F.col("x2b")).alias("b0"),
        )
        synth = F.col("b0") + F.col("b1") * F.col(x1) + F.col("b2") * F.col(x2)
        j = daily.crossJoin(F.broadcast(coefs))
        fit = j.where(F.col("dom") <= 20).agg(
            F.sqrt(F.avg(F.pow(F.col(y) - synth, 2))).alias("pre_rmse")
        )
        post = j.where(F.col("dom") > 20).agg(
            F.avg(F.col(y) - synth).alias("post_effect")
        )
        return fit.crossJoin(F.broadcast(post)).select(
            F.lit(name).alias("unit"),
            F.round("pre_rmse", 6).alias("pre_rmse"),
            F.round("post_effect", 6).alias("post_effect"),
        )

    return (
        unit("p", "c", "v", "purchase")
        .unionByName(unit("c", "p", "v", "click"))
        .unionByName(unit("v", "p", "c", "view"))
        .orderBy("unit")
    )


_EVENT_STUDY_SQL = f"""
    WITH daily AS ({_DAILY3}),
    gaps AS (
      SELECT dom - 15 AS tau, p - c AS gap
      FROM daily WHERE dom BETWEEN 10 AND 20
    ),
    base AS (
      SELECT gap AS g0 FROM gaps WHERE tau = -1
    ),
    coefs AS (
      SELECT g.tau, g.gap - (SELECT g0 FROM base) AS beta
      FROM gaps g
    )
    SELECT CAST(tau AS BIGINT) AS rel_day,
           ROUND(beta, 6) AS beta,
           ROUND(AVG(CASE WHEN tau < 0 THEN beta END)
                 OVER (ORDER BY tau
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS pretrend_running_mean
    FROM coefs
    ORDER BY rel_day
"""


@register("event_study_events", _EVENT_STUDY_SQL)
def event_study_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.dayofmonth(F.date_trunc("day", "ts")).alias("dom"),
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("p"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("c"),
    )
    gaps = daily.where(F.col("dom").between(10, 20)).select(
        (F.col("dom") - 15).alias("tau"), (F.col("p") - F.col("c")).alias("gap")
    )
    base = gaps.where(F.col("tau") == -1).select(
        F.col("gap").alias("g0")
    )
    coefs = gaps.crossJoin(F.broadcast(base)).select(
        "tau", (F.col("gap") - F.col("g0")).alias("beta")
    )
    wc = Window.orderBy("tau").rowsBetween(Window.unboundedPreceding, 0)
    return coefs.select(
        F.col("tau").cast("long").alias("rel_day"),
        F.round("beta", 6).alias("beta"),
        F.round(
            F.avg(F.when(F.col("tau") < 0, F.col("beta"))).over(wc), 6
        ).alias("pretrend_running_mean"),
    ).orderBy("rel_day")
