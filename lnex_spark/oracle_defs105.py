"""Hundred-fifth oracle-registry module: distributional treatment
effects and mediation.

  * qte_events — quantile treatment effects for the deterministic
    md5 A/B arms: per-arm p25/p50/p75 as EXACT ordered row picks
    and their differences.  Mean-based readouts (ab_test, CUPED,
    post-stratification) miss effects that move the tails without
    moving the center; the QTE triple is the distributional
    companion.

  * mediation_events — Baron-Kenny mediation decomposition, closed
    form from raw moments: treatment = md5 arm, mediator = is-click,
    outcome = value.  Total effect c (simple regression), path a
    (T→M), and the two-regressor OLS solved exactly for b (M→Y
    holding T) and the direct effect c', giving indirect = a·b and
    the proportion mediated.  One aggregation pass — the "does the
    effect go THROUGH the mediator" question answered without any
    iterative fitting; completes the causal suite next to
    DiD/PSM/RDD/IV-free designs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ARM_SQL = """CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END"""


_QTE_SQL = f"""
    WITH base AS (
      SELECT event_id, value, {_ARM_SQL} AS arm FROM events
    ),
    ranked AS (
      SELECT arm, value,
             row_number() OVER (PARTITION BY arm ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY arm) AS n
      FROM base
    ),
    quarts AS (
      SELECT arm, MAX(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q25,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.50) AS BIGINT) THEN value END) AS q50,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q75
      FROM ranked GROUP BY arm
    )
    SELECT t.n AS n_treat, c.n AS n_ctrl,
           ROUND(t.q25 - c.q25, 6) AS qte_25,
           ROUND(t.q50 - c.q50, 6) AS qte_50,
           ROUND(t.q75 - c.q75, 6) AS qte_75
    FROM (SELECT * FROM quarts WHERE arm = 1) t,
         (SELECT * FROM quarts WHERE arm = 0) c
"""


@register("qte_events", _QTE_SQL)
def qte_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        1,
    ).otherwise(0)
    base = ev.select("event_id", "value", arm.alias("arm"))
    w = Window.partitionBy("arm").orderBy("value", "event_id")
    wn = Window.partitionBy("arm")
    ranked = base.select(
        "arm",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(q):
        return F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * q).cast("long"), F.col("value"))
        )

    quarts = ranked.groupBy("arm").agg(
        F.max("n").alias("n"),
        pick(0.25).alias("q25"),
        pick(0.50).alias("q50"),
        pick(0.75).alias("q75"),
    )
    t = quarts.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_treat"),
        F.col("q25").alias("tq25"),
        F.col("q50").alias("tq50"),
        F.col("q75").alias("tq75"),
    )
    c = quarts.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_ctrl"),
        F.col("q25").alias("cq25"),
        F.col("q50").alias("cq50"),
        F.col("q75").alias("cq75"),
    )
    return t.crossJoin(c).select(
        "n_treat",
        "n_ctrl",
        F.round(F.col("tq25") - F.col("cq25"), 6).alias("qte_25"),
        F.round(F.col("tq50") - F.col("cq50"), 6).alias("qte_50"),
        F.round(F.col("tq75") - F.col("cq75"), 6).alias("qte_75"),
    )


_MED_SQL = f"""
    WITH base AS (
      SELECT {_ARM_SQL} * 1.0 AS t,
             CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS m,
             value AS y
      FROM events
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(t * y) - AVG(t) * AVG(y) AS c_ty,
             AVG(t * m) - AVG(t) * AVG(m) AS c_tm,
             AVG(m * y) - AVG(m) * AVG(y) AS c_my,
             AVG(t * t) - AVG(t) * AVG(t) AS v_t,
             AVG(m * m) - AVG(m) * AVG(m) AS v_m
      FROM base
    ),
    paths AS (
      SELECT n,
             c_ty / v_t AS c_total,
             c_tm / v_t AS a,
             (c_my * v_t - c_ty * c_tm) / (v_m * v_t - c_tm * c_tm) AS b,
             (c_ty * v_m - c_my * c_tm) / (v_t * v_m - c_tm * c_tm) AS c_direct
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(c_total, 6) AS c_total,
           ROUND(a, 6) AS path_a,
           ROUND(b, 6) AS path_b,
           ROUND(c_direct, 6) AS c_direct,
           ROUND(a * b, 6) AS indirect,
           ROUND(a * b / c_total, 6) AS prop_mediated
    FROM paths
"""


@register("mediation_events", _MED_SQL)
def mediation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        1.0,
    ).otherwise(0.0)
    base = ev.select(
        arm.alias("t"),
        F.when(F.col("event_type") == "click", 1.0).otherwise(0.0).alias("m"),
        F.col("value").alias("y"),
    )
    mom = base.agg(
        F.count("*").alias("n"),
        (F.avg(F.col("t") * F.col("y")) - F.avg("t") * F.avg("y")).alias("c_ty"),
        (F.avg(F.col("t") * F.col("m")) - F.avg("t") * F.avg("m")).alias("c_tm"),
        (F.avg(F.col("m") * F.col("y")) - F.avg("m") * F.avg("y")).alias("c_my"),
        (F.avg(F.col("t") * F.col("t")) - F.avg("t") * F.avg("t")).alias("v_t"),
        (F.avg(F.col("m") * F.col("m")) - F.avg("m") * F.avg("m")).alias("v_m"),
    )
    det = F.col("v_m") * F.col("v_t") - F.col("c_tm") * F.col("c_tm")
    paths = mom.select(
        "n",
        (F.col("c_ty") / F.col("v_t")).alias("c_total"),
        (F.col("c_tm") / F.col("v_t")).alias("a"),
        ((F.col("c_my") * F.col("v_t") - F.col("c_ty") * F.col("c_tm")) / det).alias("b"),
        (
            (F.col("c_ty") * F.col("v_m") - F.col("c_my") * F.col("c_tm")) / det
        ).alias("c_direct"),
    )
    return paths.select(
        F.col("n").cast("long").alias("n"),
        F.round("c_total", 6).alias("c_total"),
        F.round("a", 6).alias("path_a"),
        F.round("b", 6).alias("path_b"),
        F.round("c_direct", 6).alias("c_direct"),
        F.round(F.col("a") * F.col("b"), 6).alias("indirect"),
        F.round(F.col("a") * F.col("b") / F.col("c_total"), 6).alias("prop_mediated"),
    )
