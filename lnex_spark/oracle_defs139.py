"""Hundred-thirty-ninth oracle-registry module: the two assumption
checks that anova / welch_ttest_events (oracle_defs104) lean on but
never verify —

  * levene_bf_events — Brown-Forsythe test (Levene's test with
    median centering, the robust variant) for homogeneity of the
    value variance across the five event types:
    z_ij = |x_ij − median_j|, W = ((N−k)/(k−1)) · Σ n_j(z̄_j−z̄)² /
    ΣΣ(z_ij−z̄_j)².  Group medians come from the exact interpolated
    percentile (identical definitions both engines); the heavy pass
    is two hash aggregations over events plus one broadcast of the
    k=5 medians back onto the rows — no window at all.

  * jarque_bera_events — Jarque-Bera normality statistic per event
    type from explicitly-computed central moments (avg of powered
    deviations around the broadcast group mean — NOT the engines'
    skewness()/kurtosis() builtins, whose bias corrections differ
    between Spark and DuckDB): g1 = m3/m2^1.5, g2 = m4/m2² − 3,
    JB = n/6 · (g1² + g2²/4).  Two aggregation passes, group-keyed
    shuffle only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LEVENE_SQL = """
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type, ABS(e.value - m.med) AS z
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    grp AS (
      SELECT event_type, COUNT(*) AS n_j, AVG(z) AS zbar_j,
             SUM(z) AS zsum_j,
             SUM(z * z) AS zsq_j
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n_j) AS n, COUNT(*) AS k,
             SUM(zsum_j) / SUM(n_j) AS zbar,
             SUM(n_j * POW(zbar_j, 2)) AS sum_n_zbar2,
             SUM(zsq_j - n_j * POW(zbar_j, 2)) AS within
      FROM grp
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           ROUND((n - k) * 1.0 / (k - 1)
                 * (sum_n_zbar2 - n * POW(zbar, 2)) / within, 6)
             AS w_stat
    FROM tot
"""


@register("levene_bf_events", _LEVENE_SQL)
def levene_bf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    grp = z.groupBy("event_type").agg(
        F.count("*").alias("n_j"),
        F.avg("z").alias("zbar_j"),
        F.sum("z").alias("zsum_j"),
        F.sum(F.col("z") * F.col("z")).alias("zsq_j"),
    )
    tot = grp.agg(
        F.sum("n_j").alias("n"),
        F.count("*").alias("k"),
        (F.sum("zsum_j") / F.sum("n_j")).alias("zbar"),
        F.sum(F.col("n_j") * F.pow("zbar_j", 2)).alias("sum_n_zbar2"),
        F.sum(
            F.col("zsq_j") - F.col("n_j") * F.pow("zbar_j", 2)
        ).alias("within"),
    )
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(
            (F.col("n") - F.col("k"))
            * 1.0
            / (F.col("k") - 1)
            * (F.col("sum_n_zbar2") - F.col("n") * F.pow("zbar", 2))
            / F.col("within"),
            6,
        ).alias("w_stat"),
    )


_JB_SQL = """
    WITH mu AS (
      SELECT event_type, AVG(value) AS mean_v
      FROM events GROUP BY event_type
    ),
    mom AS (
      SELECT e.event_type,
             COUNT(*) AS n,
             AVG(POW(e.value - m.mean_v, 2)) AS m2,
             AVG(POW(e.value - m.mean_v, 3)) AS m3,
             AVG(POW(e.value - m.mean_v, 4)) AS m4
      FROM events e JOIN mu m ON e.event_type = m.event_type
      GROUP BY e.event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(m3 / POW(m2, 1.5), 6) AS skew_g1,
           ROUND(m4 / POW(m2, 2) - 3.0, 6) AS kurt_g2,
           ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
                 + POW(m4 / POW(m2, 2) - 3.0, 2) / 4.0), 6) AS jb
    FROM mom ORDER BY event_type
"""


@register("jarque_bera_events", _JB_SQL)
def jarque_bera_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(F.avg("value").alias("mean_v"))
    mom = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg(F.pow(F.col("value") - F.col("mean_v"), 2)).alias("m2"),
            F.avg(F.pow(F.col("value") - F.col("mean_v"), 3)).alias("m3"),
            F.avg(F.pow(F.col("value") - F.col("mean_v"), 4)).alias("m4"),
        )
    )
    g1 = F.col("m3") / F.pow("m2", 1.5)
    g2 = F.col("m4") / F.pow("m2", 2) - 3.0
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(g1, 6).alias("skew_g1"),
        F.round(g2, 6).alias("kurt_g2"),
        F.round(
            F.col("n") / 6.0 * (F.pow(g1, 2) + F.pow(g2, 2) / 4.0), 6
        ).alias("jb"),
    ).orderBy("event_type")
