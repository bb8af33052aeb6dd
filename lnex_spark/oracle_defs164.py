"""Hundred-sixty-fourth oracle-registry module: the two remaining
classical multiple-testing procedures next to bh_fdr_events —
family-wise step-down control and evidence combination.  Same
deterministic permutation machinery as the BH op (md5-salted arms,
B=16 relabelings, p exact multiples of 1/17 so cross-engine ranking
is exact), independent 'holm' salt family.

  * holm_bonferroni_events — Holm's step-DOWN FWER control at
    alpha = 0.10 over the per-type permutation tests: sort p
    ascending, the i-th test's threshold is alpha/(m-i+1), and
    rejection stops at the FIRST failure (a running MIN over the
    rank order — every later test is accepted regardless of its p).
    Controls the probability of ANY false alert, the stricter
    guarantee ops teams want for paging (vs BH's rate control for
    triage).

  * fisher_combined_events — Fisher's method over the same family:
    X = -2 sum ln p ~ chi2(2m) under the global null, plus
    Tippett's min-p statistic with its Bonferroni-exact level
    1-(1-p_min)^m.  Answers "is there an effect ANYWHERE" with one
    number — the meta-analytic dual of meta_analysis_events for
    p-values instead of effect sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_B = 16
_ALPHA = 0.10

_PVALS_SQL = f"""base AS (
      SELECT event_type, event_id, value,
             CASE WHEN CAST(('0x' || substr(md5('holm-obs#'
                    || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS arm_a
      FROM events
    ),
    obs AS (
      SELECT event_type,
             abs(AVG(CASE WHEN arm_a = 1 THEN value END)
                 - AVG(CASE WHEN arm_a = 0 THEN value END)) AS d_obs
      FROM base GROUP BY event_type
    ),
    fan AS (
      SELECT b.event_type, r.rep, b.value,
             CASE WHEN CAST(('0x' || substr(md5('holmperm'
                    || CAST(r.rep AS VARCHAR) || '#'
                    || CAST(b.event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS arm_a
      FROM base b, (SELECT unnest(range(1, {_B + 1})) AS rep) r
    ),
    perms AS (
      SELECT event_type, rep,
             abs(AVG(CASE WHEN arm_a = 1 THEN value END)
                 - AVG(CASE WHEN arm_a = 0 THEN value END)) AS d
      FROM fan GROUP BY event_type, rep
    ),
    pvals AS (
      SELECT o.event_type,
             (1.0 + SUM(CASE WHEN p.d >= o.d_obs THEN 1 ELSE 0 END))
               / (1.0 + {_B}) AS p
      FROM obs o JOIN perms p ON o.event_type = p.event_type
      GROUP BY o.event_type
    )"""


_HOLM_SQL = f"""
    WITH {_PVALS_SQL},
    ranked AS (
      SELECT event_type, p,
             row_number() OVER (ORDER BY p, event_type) AS rk,
             COUNT(*) OVER () AS m
      FROM pvals
    ),
    flagged AS (
      SELECT event_type, p, rk, m,
             {_ALPHA!r} / (m - rk + 1) AS crit,
             CASE WHEN p <= {_ALPHA!r} / (m - rk + 1) THEN 1 ELSE 0 END
               AS ok
      FROM ranked
    )
    SELECT event_type, ROUND(p, 6) AS p_value, rk,
           ROUND(crit, 6) AS holm_crit,
           CAST(MIN(ok) OVER (ORDER BY rk) AS INTEGER) AS rejected
    FROM flagged
    ORDER BY rk
"""


def _spark_pvals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def arm(salt_col):
        return F.when(
            F.pmod(
                F.conv(F.substring(F.md5(salt_col), 1, 4), 16, 10).cast(
                    "long"
                ),
                F.lit(2),
            )
            == 0,
            1,
        ).otherwise(0)

    base = ev.select(
        "event_type",
        "event_id",
        "value",
        arm(
            F.concat(F.lit("holm-obs#"), F.col("event_id").cast("string"))
        ).alias("arm_a"),
    )
    obs = base.groupBy("event_type").agg(
        F.abs(
            F.avg(F.when(F.col("arm_a") == 1, F.col("value")))
            - F.avg(F.when(F.col("arm_a") == 0, F.col("value")))
        ).alias("d_obs")
    )
    reps = base.sparkSession.range(1, _B + 1).select(
        F.col("id").alias("rep")
    )
    fan = base.crossJoin(F.broadcast(reps)).select(
        "event_type",
        "rep",
        "value",
        arm(
            F.concat(
                F.lit("holmperm"),
                F.col("rep").cast("string"),
                F.lit("#"),
                F.col("event_id").cast("string"),
            )
        ).alias("arm_a"),
    )
    perms = fan.groupBy("event_type", "rep").agg(
        F.abs(
            F.avg(F.when(F.col("arm_a") == 1, F.col("value")))
            - F.avg(F.when(F.col("arm_a") == 0, F.col("value")))
        ).alias("d")
    )
    return (
        obs.join(perms, "event_type")
        .groupBy("event_type")
        .agg(
            (
                (
                    1.0
                    + F.sum(
                        F.when(F.col("d") >= F.col("d_obs"), 1).otherwise(0)
                    )
                )
                / (1.0 + _B)
            ).alias("p")
        )
    )


@register("holm_bonferroni_events", _HOLM_SQL)
def holm_bonferroni_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pvals = _spark_pvals(spark, sf_dir)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pvals.select(
        "event_type",
        "p",
        F.row_number().over(Window.orderBy("p", "event_type")).alias("rk"),
        F.count("*").over(wall).alias("m"),
    )
    crit = _ALPHA / (F.col("m") - F.col("rk") + 1)
    flagged = ranked.select(
        "event_type",
        "p",
        "rk",
        crit.alias("crit"),
        F.when(F.col("p") <= crit, 1).otherwise(0).alias("ok"),
    )
    wmin = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    return flagged.select(
        "event_type",
        F.round("p", 6).alias("p_value"),
        "rk",
        F.round("crit", 6).alias("holm_crit"),
        F.min("ok").over(wmin).cast("int").alias("rejected"),
    ).orderBy("rk")


_FISHER_SQL = f"""
    WITH {_PVALS_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           ROUND(-2 * SUM(LN(p)), 6) AS fisher_x2,
           CAST(2 * COUNT(*) AS BIGINT) AS df,
           ROUND(MIN(p), 6) AS min_p,
           ROUND(1 - POW(1 - MIN(p), COUNT(*)), 6) AS tippett_level
    FROM pvals
"""


@register("fisher_combined_events", _FISHER_SQL)
def fisher_combined_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pvals = _spark_pvals(spark, sf_dir)
    return pvals.agg(
        F.count("*").cast("long").alias("m"),
        F.round(-2 * F.sum(F.log("p")), 6).alias("fisher_x2"),
        (2 * F.count("*")).cast("long").alias("df"),
        F.round(F.min("p"), 6).alias("min_p"),
        F.round(1 - F.pow(1 - F.min("p"), F.count("*")), 6).alias(
            "tippett_level"
        ),
    )
