"""Hundred-sixty-eighth oracle-registry module: the two survival
readouts the KM / Nelson-Aalen / log-rank suite still lacked, on the
SAME censored user×type episode table (duration = floor days between
first and last event of the pair; death = the episode ends more than
2 days before the user's own horizon — see oracle_defs134).

  * rmst_episodes — restricted mean survival time to tau = 10 days:
    integrate the KM product-limit curve (computed as
    exp(cum sum ln(1 - d/n)) over the ordered death times) piecewise
    between event times, truncated at tau.  THE recommended
    replacement for median survival when the curve never crosses
    50%, and a difference-able effect size (days of life per user
    within 10) where hazard ratios need proportionality assumptions.

  * cumulative_incidence_episodes — Aalen-Johansen cumulative
    incidence under competing risks, splitting deaths into cause A
    (click/view episodes) vs cause B (other types):
    CIF_k(t) = sum_{t_i<=t} S(t_{i-1}) d_k_i / n_i with the
    all-cause KM survivor S.  1 - KM(cause A alone) OVERSTATES A's
    incidence because it treats B-deaths as censoring; the AJ
    estimator is the correct decomposition (cif_a + cif_b + S = 1
    at every step, which doubles as an internal identity check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_DAY_US = 86_400_000_000
_TAU = 10


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LIVES_SQL = f"""lives AS (
      SELECT user_id, event_type,
             CAST(floor((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                        / {_DAY_US}.0) AS BIGINT) AS dur,
             epoch_us(MAX(ts)) AS last_us
      FROM events GROUP BY user_id, event_type
    ),
    horizon AS (
      SELECT user_id, MAX(last_us) AS u_last FROM lives GROUP BY user_id
    ),
    labeled AS (
      SELECT dur, event_type,
             CASE WHEN last_us < u_last - 2 * {_DAY_US} THEN 1 ELSE 0 END
               AS ev
      FROM lives JOIN horizon USING (user_id)
    ),
    per_dur AS (
      SELECT dur,
             SUM(ev) AS deaths,
             SUM(CASE WHEN ev = 1
                      AND event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END) AS d_a,
             SUM(CASE WHEN ev = 1
                      AND event_type NOT IN ('click', 'view')
                      THEN 1 ELSE 0 END) AS d_b,
             COUNT(*) AS leavers
      FROM labeled GROUP BY dur
    ),
    risked AS (
      SELECT dur, deaths, d_a, d_b,
             (SELECT COUNT(*) FROM labeled)
               - COALESCE(SUM(leavers) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM per_dur
    ),
    km AS (
      SELECT dur, deaths, d_a, d_b, at_risk,
             EXP(SUM(LN(1 - CAST(deaths AS DOUBLE) / at_risk))
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS s,
             EXP(COALESCE(SUM(LN(1 - CAST(deaths AS DOUBLE) / at_risk))
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               AS s_prev
      FROM risked WHERE deaths > 0
    )"""


_RMST_SQL = f"""
    WITH {_LIVES_SQL},
    seg AS (
      SELECT dur, s, s_prev,
             LEAST(dur, {_TAU}) AS t_now,
             COALESCE(LEAST(LAG(dur) OVER (ORDER BY dur), {_TAU}), 0)
               AS t_prev
      FROM km WHERE dur >= 0
    ),
    area AS (
      SELECT SUM(s_prev * (t_now - t_prev)) AS a,
             MAX(CASE WHEN dur <= {_TAU} THEN s END) AS s_tau,
             MAX(CASE WHEN dur <= {_TAU} THEN dur END) AS last_t
      FROM seg WHERE t_now > t_prev
    )
    SELECT CAST({_TAU} AS BIGINT) AS tau,
           ROUND(a + s_tau * ({_TAU} - last_t), 6) AS rmst,
           ROUND(s_tau, 6) AS s_at_tau
    FROM area
"""


@register("rmst_episodes", _RMST_SQL)
def rmst_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    km = _km_frame(spark, sf_dir)
    wo = Window.orderBy("dur")
    seg = km.select(
        "dur",
        "s",
        "s_prev",
        F.least(F.col("dur"), F.lit(_TAU)).alias("t_now"),
        F.coalesce(
            F.least(F.lag("dur").over(wo), F.lit(_TAU)), F.lit(0)
        ).alias("t_prev"),
    )
    area = seg.where(F.col("t_now") > F.col("t_prev")).agg(
        F.sum(F.col("s_prev") * (F.col("t_now") - F.col("t_prev"))).alias("a"),
        F.max(F.when(F.col("dur") <= _TAU, F.col("s"))).alias("s_tau"),
        F.max(F.when(F.col("dur") <= _TAU, F.col("dur"))).alias("last_t"),
    )
    return area.select(
        F.lit(_TAU).cast("long").alias("tau"),
        F.round(
            F.col("a") + F.col("s_tau") * (_TAU - F.col("last_t")), 6
        ).alias("rmst"),
        F.round("s_tau", 6).alias("s_at_tau"),
    )


def _km_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lives = ev.groupBy("user_id", "event_type").agg(
        F.floor((F.max(us) - F.min(us)) / float(_DAY_US))
        .cast("long")
        .alias("dur"),
        F.max(us).alias("last_us"),
    )
    horizon = lives.groupBy("user_id").agg(F.max("last_us").alias("u_last"))
    labeled = lives.join(horizon, "user_id").select(
        "dur",
        "event_type",
        F.when(F.col("last_us") < F.col("u_last") - 2 * _DAY_US, 1)
        .otherwise(0)
        .alias("ev"),
    )
    cv = F.col("event_type").isin("click", "view")
    per_dur = labeled.groupBy("dur").agg(
        F.sum("ev").alias("deaths"),
        F.sum(F.when((F.col("ev") == 1) & cv, 1).otherwise(0)).alias("d_a"),
        F.sum(F.when((F.col("ev") == 1) & ~cv, 1).otherwise(0)).alias("d_b"),
        F.count("*").alias("leavers"),
    )
    total = labeled.count()
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wcur = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risked = per_dur.withColumn(
        "at_risk",
        F.lit(total) - F.coalesce(F.sum("leavers").over(wprev), F.lit(0)),
    )
    lnterm = F.log(1 - F.col("deaths").cast("double") / F.col("at_risk"))
    return (
        risked.where(F.col("deaths") > 0)
        .withColumn("s", F.exp(F.sum(lnterm).over(wcur)))
        .withColumn(
            "s_prev",
            F.exp(F.coalesce(F.sum(lnterm).over(wprev), F.lit(0.0))),
        )
    )


_CIF_SQL = f"""
    WITH {_LIVES_SQL}
    SELECT dur AS duration_days,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(d_a AS BIGINT) AS d_a, CAST(d_b AS BIGINT) AS d_b,
           ROUND(SUM(s_prev * CAST(d_a AS DOUBLE) / at_risk)
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cif_a,
           ROUND(SUM(s_prev * CAST(d_b AS DOUBLE) / at_risk)
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cif_b,
           ROUND(s, 6) AS km_survival
    FROM km
    ORDER BY duration_days
"""


@register("cumulative_incidence_episodes", _CIF_SQL)
def cumulative_incidence_episodes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    km = _km_frame(spark, sf_dir)
    wcur = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.col("d_a").cast("long").alias("d_a"),
        F.col("d_b").cast("long").alias("d_b"),
        F.round(
            F.sum(
                F.col("s_prev") * F.col("d_a").cast("double") / F.col("at_risk")
            ).over(wcur),
            6,
        ).alias("cif_a"),
        F.round(
            F.sum(
                F.col("s_prev") * F.col("d_b").cast("double") / F.col("at_risk")
            ).over(wcur),
            6,
        ).alias("cif_b"),
        F.round("s", 6).alias("km_survival"),
    ).orderBy("duration_days")
