"""Hundred-fifty-sixth oracle-registry module: the two classical
omnibus tests still missing around the ANOVA/Kruskal cluster.

  * friedman_events — Friedman repeated-measures rank test with days
    as blocks and event types as treatments: the blocked design that
    kruskal_wallis_events (fully independent groups) cannot model.
    Observation = daily mean value per (day, type), ROUNDED to 6
    before ranking; within-block average ranks are computed
    tie-stably as (2*rank + ties - 1)/2, chi2_F = 12/(n k (k+1)) *
    sum R_j^2 - 3 n (k+1), plus the Iman-Davenport F transform
    (n-1) chi2 / (n (k-1) - chi2) which is the recommended modern
    reference distribution.  dunn_test / tukey_hsd are its post-hocs.

  * bartlett_events — Bartlett's test of equal value-variance across
    event types from per-group raw moments: T = ((N-k) ln s_p^2 -
    sum (n_i-1) ln s_i^2) / C with the standard correction C = 1 +
    (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)).  The likelihood-ratio
    sibling of levene_bf_events — more powerful under normality,
    which jarque_bera_events checks first; together they form the
    textbook pre-flight for anova_f_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FRIEDMAN_SQL = """
    WITH cell AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             ROUND(AVG(value), 6) AS m
      FROM events GROUP BY 1, 2
    ),
    full_blocks AS (
      SELECT d FROM cell GROUP BY d
      HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM cell)
    ),
    ranked AS (
      SELECT c.d, c.event_type,
             (2.0 * RANK() OVER (PARTITION BY c.d ORDER BY c.m)
              + COUNT(*) OVER (PARTITION BY c.d, c.m) - 1) / 2 AS r
      FROM cell c JOIN full_blocks f ON c.d = f.d
    ),
    rsum AS (
      SELECT event_type, SUM(r) AS rj FROM ranked GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT d) AS DOUBLE) AS n,
             CAST(COUNT(DISTINCT event_type) AS DOUBLE) AS k
      FROM ranked
    ),
    chi AS (
      SELECT d.n, d.k,
             12 / (d.n * d.k * (d.k + 1)) * SUM(r.rj * r.rj)
               - 3 * d.n * (d.k + 1) AS chi2
      FROM rsum r CROSS JOIN dims d
      GROUP BY d.n, d.k
    )
    SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
           ROUND(chi2, 6) AS friedman_chi2,
           ROUND((n - 1) * chi2 / (n * (k - 1) - chi2), 6) AS iman_davenport_f
    FROM chi
"""


@register("friedman_events", _FRIEDMAN_SQL)
def friedman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"), "event_type"
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    k_types = cell.select("event_type").distinct().count()
    full_blocks = (
        cell.groupBy("d").agg(F.count("*").alias("c")).where(F.col("c") == k_types)
    ).select("d")
    base = cell.join(full_blocks, "d")
    wr = Window.partitionBy("d").orderBy("m")
    wt = Window.partitionBy("d", "m")
    ranked = base.select(
        "d",
        "event_type",
        (
            (2.0 * F.rank().over(wr) + F.count("*").over(wt) - 1) / 2
        ).alias("r"),
    )
    rsum = ranked.groupBy("event_type").agg(F.sum("r").alias("rj"))
    dims = ranked.agg(
        F.countDistinct("d").cast("double").alias("n"),
        F.countDistinct("event_type").cast("double").alias("k"),
    )
    chi = (
        rsum.crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(
            (
                12
                / (F.col("n") * F.col("k") * (F.col("k") + 1))
                * F.sum(F.col("rj") * F.col("rj"))
                - 3 * F.col("n") * (F.col("k") + 1)
            ).alias("chi2")
        )
    )
    return chi.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k"),
        F.round("chi2", 6).alias("friedman_chi2"),
        F.round(
            (F.col("n") - 1)
            * F.col("chi2")
            / (F.col("n") * (F.col("k") - 1) - F.col("chi2")),
            6,
        ).alias("iman_davenport_f"),
    )


_BARTLETT_SQL = """
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             (SUM(value * value) - COUNT(*) * AVG(value) * AVG(value))
               / (COUNT(*) - 1) AS s2
      FROM events GROUP BY event_type
      HAVING COUNT(*) > 1
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn,
             SUM((n - 1) * s2) AS pooled_ss,
             SUM((n - 1) * LN(s2)) AS sum_ln,
             SUM(1.0 / (n - 1)) AS sum_inv
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
           ROUND(pooled_ss / (nn - k), 6) AS pooled_var,
           ROUND(((nn - k) * LN(pooled_ss / (nn - k)) - sum_ln)
                 / (1 + (sum_inv - 1.0 / (nn - k)) / (3 * (k - 1))), 6)
             AS bartlett_t,
           CAST(k - 1 AS BIGINT) AS df
    FROM tot
"""


@register("bartlett_events", _BARTLETT_SQL)
def bartlett_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (
                (
                    F.sum(F.col("value") * F.col("value"))
                    - F.count("*") * F.avg("value") * F.avg("value")
                )
                / (F.count("*") - 1)
            ).alias("s2"),
        )
        .where(F.col("n") > 1)
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_ss"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sum_ln"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    dof = F.col("nn") - F.col("k")
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("nn").cast("long").alias("n"),
        F.round(F.col("pooled_ss") / dof, 6).alias("pooled_var"),
        F.round(
            (dof * F.log(F.col("pooled_ss") / dof) - F.col("sum_ln"))
            / (
                1
                + (F.col("sum_inv") - 1.0 / dof) / (3 * (F.col("k") - 1))
            ),
            6,
        ).alias("bartlett_t"),
        (F.col("k") - 1).cast("long").alias("df"),
    )
