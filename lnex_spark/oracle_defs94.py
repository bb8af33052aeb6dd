"""Ninety-fourth oracle-registry module: doubly-robust counterfactuals
and post-stratified experiment readout.

  * doubly_robust_eval_events — the doubly-robust (DR) off-policy
    estimator over the same target policy as ips_policy_eval_events:
    DR = direct-model prediction at the target action plus the
    propensity-weighted residual correction on matching rows,
    DR_i = μ̂(a*_i) + 1{a_i = a*_i}/p̂(a_i) · (r_i − μ̂(a_i)) with the
    per-action mean value as the direct model.  Unbiased if EITHER
    the model or the propensities are right — the estimator of
    choice when both are empirical; reported next to DM and IPS so
    the three-way agreement is auditable in one row.

  * poststrat_ab_events — post-stratification of a deterministic
    md5 A/B readout: the arm difference re-weighted by each user
    segment's overall share, Δ_ps = Σ_g w_g (ȳ_t,g − ȳ_c,g),
    removing the composition noise a lucky randomization leaves in
    the naive difference.  The small-sample variance-reduction
    sibling of CUPED (covariate = segment membership instead of a
    pre-metric); exact integer counts, one aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DR_SQL = """
    WITH prop AS (
      SELECT event_type,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events) AS p,
             AVG(value) AS mu
      FROM events GROUP BY event_type
    ),
    base AS (
      SELECT e.value, e.event_type, pa.p AS p_logged, pa.mu AS mu_logged,
             pt.mu AS mu_target,
             CASE WHEN e.user_id % 2 = 0 THEN 'view' ELSE 'click' END AS target_action
      FROM events e
      JOIN prop pa ON e.event_type = pa.event_type
      JOIN prop pt ON pt.event_type =
           CASE WHEN e.user_id % 2 = 0 THEN 'view' ELSE 'click' END
    ),
    terms AS (
      SELECT mu_target AS dm_term,
             CASE WHEN event_type = target_action
                  THEN value / p_logged ELSE 0.0 END AS ips_term,
             mu_target
               + CASE WHEN event_type = target_action
                      THEN (value - mu_logged) / p_logged ELSE 0.0 END AS dr_term
      FROM base
    )
    SELECT COUNT(*) AS n_logged,
           ROUND(AVG(dm_term), 6) AS dm_estimate,
           ROUND(AVG(ips_term), 6) AS ips_estimate,
           ROUND(AVG(dr_term), 6) AS dr_estimate
    FROM terms
"""


@register("doubly_robust_eval_events", _DR_SQL)
def doubly_robust_eval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tot = ev.agg(F.count("*").alias("n_all"))
    prop = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("c"), F.avg("value").alias("mu"))
        .crossJoin(tot)
        .select("event_type", (F.col("c") * 1.0 / F.col("n_all")).alias("p"), "mu")
    )
    target = F.when(F.col("user_id") % 2 == 0, "view").otherwise("click")
    base = (
        ev.select("value", "event_type", target.alias("target_action"))
        .join(
            prop.select(
                F.col("event_type").alias("lg_type"),
                F.col("p").alias("p_logged"),
                F.col("mu").alias("mu_logged"),
            ),
            F.col("event_type") == F.col("lg_type"),
        )
        .join(
            prop.select(
                F.col("event_type").alias("tg_type"), F.col("mu").alias("mu_target")
            ),
            F.col("target_action") == F.col("tg_type"),
        )
    )
    match = F.col("event_type") == F.col("target_action")
    terms = base.select(
        F.col("mu_target").alias("dm_term"),
        F.when(match, F.col("value") / F.col("p_logged")).otherwise(0.0).alias(
            "ips_term"
        ),
        (
            F.col("mu_target")
            + F.when(
                match, (F.col("value") - F.col("mu_logged")) / F.col("p_logged")
            ).otherwise(0.0)
        ).alias("dr_term"),
    )
    return terms.agg(
        F.count("*").alias("n_logged"),
        F.round(F.avg("dm_term"), 6).alias("dm_estimate"),
        F.round(F.avg("ips_term"), 6).alias("ips_estimate"),
        F.round(F.avg("dr_term"), 6).alias("dr_estimate"),
    )


_PS_SQL = """
    WITH base AS (
      SELECT user_id % 4 AS segment, value,
             CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS arm_a
      FROM events
    ),
    cells AS (
      SELECT segment, arm_a, COUNT(*) AS n, AVG(value) AS m
      FROM base GROUP BY segment, arm_a
    ),
    seg AS (
      SELECT segment,
             MAX(CASE WHEN arm_a = 1 THEN m END) AS m_t,
             MAX(CASE WHEN arm_a = 0 THEN m END) AS m_c,
             SUM(n) AS n_seg
      FROM cells GROUP BY segment
    ),
    tot AS (SELECT SUM(n_seg) AS n_all FROM seg),
    naive AS (
      SELECT AVG(CASE WHEN arm_a = 1 THEN value END)
             - AVG(CASE WHEN arm_a = 0 THEN value END) AS d_naive
      FROM base
    )
    SELECT CAST(t.n_all AS BIGINT) AS n_all,
           ROUND(n.d_naive, 6) AS naive_diff,
           ROUND(SUM((s.n_seg * 1.0 / t.n_all) * (s.m_t - s.m_c)), 6)
             AS poststrat_diff
    FROM seg s CROSS JOIN tot t CROSS JOIN naive n
    GROUP BY t.n_all, n.d_naive
"""


@register("poststrat_ab_events", _PS_SQL)
def poststrat_ab_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    base = ev.select((F.col("user_id") % 4).alias("segment"), "value", arm.alias("arm_a"))
    cells = base.groupBy("segment", "arm_a").agg(
        F.count("*").alias("n"), F.avg("value").alias("m")
    )
    seg = cells.groupBy("segment").agg(
        F.max(F.when(F.col("arm_a") == 1, F.col("m"))).alias("m_t"),
        F.max(F.when(F.col("arm_a") == 0, F.col("m"))).alias("m_c"),
        F.sum("n").alias("n_seg"),
    )
    tot = seg.agg(F.sum("n_seg").alias("n_all"))
    naive = base.agg(
        (
            F.avg(F.when(F.col("arm_a") == 1, F.col("value")))
            - F.avg(F.when(F.col("arm_a") == 0, F.col("value")))
        ).alias("d_naive")
    )
    return (
        seg.crossJoin(tot)
        .crossJoin(naive)
        .groupBy("n_all", "d_naive")
        .agg(
            F.round(
                F.sum(
                    (F.col("n_seg") * 1.0 / F.col("n_all"))
                    * (F.col("m_t") - F.col("m_c"))
                ),
                6,
            ).alias("poststrat_diff")
        )
        .select(
            F.col("n_all").cast("long").alias("n_all"),
            F.round("d_naive", 6).alias("naive_diff"),
            "poststrat_diff",
        )
    )
