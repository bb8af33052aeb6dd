"""Hundred-fiftieth oracle-registry module: cross-study evidence
pooling and its multivariate two-sample sibling.

  * meta_analysis_events — DerSimonian-Laird random-effects
    meta-analysis treating each DAY as an independent study of the
    purchase-vs-view value effect: per-day effect y_i = mean(purchase)
    - mean(view) with variance v_i = s1^2/n1 + s2^2/n2 (y_i, v_i
    ROUNDED to 6 first so both engines pool identical summands), then
    fixed-effect pooling (w = 1/v), Cochran's Q, tau^2 by the DL
    moment estimator, I^2 heterogeneity, and the random-effects
    pooled estimate with its standard error.  The canonical way to
    combine per-partition / per-shard estimates into one effect with
    honest heterogeneity accounting — exactly what a fleet-wide
    experiment readout does over per-site results.

  * hotelling_t2_events — Hotelling's T^2 two-sample test on the
    2-vector of daily means (purchase value, click value), first half
    of the month vs second half: pooled 2x2 covariance inverted in
    closed form, T^2 = n1 n2/(n1+n2) d' S^-1 d, with the exact
    F-transform (n1+n2-p-1)/((n1+n2-2)p) * T^2 at (p, n1+n2-p-1) df.
    The multivariate completion of welch_ttest_events — one test for
    "did the regime shift" across correlated metrics instead of
    per-metric tests plus multiplicity correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_META_SQL = """
    WITH g AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             COUNT(*) AS n, AVG(value) AS m,
             (SUM(value * value) - COUNT(*) * AVG(value) * AVG(value))
               / (COUNT(*) - 1) AS s2
      FROM events
      WHERE event_type IN ('purchase', 'view')
      GROUP BY 1, 2
    ),
    studies AS (
      SELECT a.d,
             ROUND(a.m - b.m, 6) AS y,
             ROUND(a.s2 / a.n + b.s2 / b.n, 6) AS v
      FROM g a JOIN g b ON a.d = b.d
      WHERE a.event_type = 'purchase' AND b.event_type = 'view'
        AND a.n > 1 AND b.n > 1
    ),
    fe AS (
      SELECT COUNT(*) AS k, SUM(1 / v) AS sw, SUM(1 / (v * v)) AS sw2,
             SUM(y / v) / SUM(1 / v) AS mu_fe
      FROM studies
    ),
    q AS (
      SELECT f.k, f.sw, f.sw2, f.mu_fe,
             SUM((s.y - f.mu_fe) * (s.y - f.mu_fe) / s.v) AS qstat
      FROM studies s CROSS JOIN fe f
      GROUP BY f.k, f.sw, f.sw2, f.mu_fe
    ),
    tau AS (
      SELECT k, mu_fe, qstat,
             GREATEST(0, (qstat - (k - 1)) / (sw - sw2 / sw)) AS tau2
      FROM q
    )
    SELECT t.k AS k,
           ROUND(t.mu_fe, 6) AS fixed_effect,
           ROUND(t.qstat, 6) AS q_stat,
           ROUND(t.tau2, 6) AS tau2,
           ROUND(GREATEST(0, (t.qstat - (t.k - 1)) / t.qstat), 6) AS i2,
           ROUND(SUM(s.y / (s.v + t.tau2)) / SUM(1 / (s.v + t.tau2)), 6)
             AS random_effect,
           ROUND(SQRT(1 / SUM(1 / (s.v + t.tau2))), 6) AS re_se
    FROM studies s CROSS JOIN tau t
    GROUP BY t.k, t.mu_fe, t.qstat, t.tau2
"""


@register("meta_analysis_events", _META_SQL)
def meta_analysis_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    g = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        (
            (
                F.sum(F.col("value") * F.col("value"))
                - F.count("*") * F.avg("value") * F.avg("value")
            )
            / (F.count("*") - 1)
        ).alias("s2"),
    )
    a = g.where((F.col("event_type") == "purchase") & (F.col("n") > 1)).alias("a")
    b = g.where((F.col("event_type") == "view") & (F.col("n") > 1)).alias("b")
    studies = a.join(b, F.col("a.d") == F.col("b.d")).select(
        F.col("a.d").alias("d"),
        F.round(F.col("a.m") - F.col("b.m"), 6).alias("y"),
        F.round(
            F.col("a.s2") / F.col("a.n") + F.col("b.s2") / F.col("b.n"), 6
        ).alias("v"),
    )
    fe = studies.agg(
        F.count("*").alias("k"),
        F.sum(1 / F.col("v")).alias("sw"),
        F.sum(1 / (F.col("v") * F.col("v"))).alias("sw2"),
        (F.sum(F.col("y") / F.col("v")) / F.sum(1 / F.col("v"))).alias("mu_fe"),
    )
    q = (
        studies.crossJoin(F.broadcast(fe))
        .groupBy("k", "sw", "sw2", "mu_fe")
        .agg(
            F.sum(
                (F.col("y") - F.col("mu_fe"))
                * (F.col("y") - F.col("mu_fe"))
                / F.col("v")
            ).alias("qstat")
        )
    )
    tau = q.select(
        "k",
        "mu_fe",
        "qstat",
        F.greatest(
            F.lit(0.0),
            (F.col("qstat") - (F.col("k") - 1))
            / (F.col("sw") - F.col("sw2") / F.col("sw")),
        ).alias("tau2"),
    )
    return (
        studies.crossJoin(F.broadcast(tau))
        .groupBy("k", "mu_fe", "qstat", "tau2")
        .agg(
            F.round(
                F.sum(F.col("y") / (F.col("v") + F.col("tau2")))
                / F.sum(1 / (F.col("v") + F.col("tau2"))),
                6,
            ).alias("random_effect"),
            F.round(
                F.sqrt(1 / F.sum(1 / (F.col("v") + F.col("tau2")))), 6
            ).alias("re_se"),
        )
        .select(
            F.col("k"),
            F.round("mu_fe", 6).alias("fixed_effect"),
            F.round("qstat", 6).alias("q_stat"),
            F.round("tau2", 6).alias("tau2"),
            F.round(
                F.greatest(
                    F.lit(0.0), (F.col("qstat") - (F.col("k") - 1)) / F.col("qstat")
                ),
                6,
            ).alias("i2"),
            "random_effect",
            "re_se",
        )
    )


_HOTELLING_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
               AS x1,
             ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
               AS x2
      FROM events GROUP BY 1
    ),
    lab AS (
      SELECT *, CASE WHEN EXTRACT(day FROM d) <= 15 THEN 1 ELSE 2 END AS grp
      FROM daily WHERE x1 IS NOT NULL AND x2 IS NOT NULL
    ),
    g AS (
      SELECT grp, COUNT(*) AS n, AVG(x1) AS m1, AVG(x2) AS m2,
             SUM(x1 * x1) - COUNT(*) * AVG(x1) * AVG(x1) AS ss11,
             SUM(x2 * x2) - COUNT(*) * AVG(x2) * AVG(x2) AS ss22,
             SUM(x1 * x2) - COUNT(*) * AVG(x1) * AVG(x2) AS ss12
      FROM lab GROUP BY grp
    ),
    pool AS (
      SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
             MAX(CASE WHEN grp = 2 THEN n END) AS n2,
             MAX(CASE WHEN grp = 1 THEN m1 END)
               - MAX(CASE WHEN grp = 2 THEN m1 END) AS d1,
             MAX(CASE WHEN grp = 1 THEN m2 END)
               - MAX(CASE WHEN grp = 2 THEN m2 END) AS d2,
             SUM(ss11) AS p11, SUM(ss22) AS p22, SUM(ss12) AS p12
      FROM g
    ),
    s AS (
      SELECT n1, n2, d1, d2,
             p11 / (n1 + n2 - 2) AS s11,
             p22 / (n1 + n2 - 2) AS s22,
             p12 / (n1 + n2 - 2) AS s12
      FROM pool
    ),
    t2 AS (
      SELECT n1, n2,
             CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
               * (d1 * (s22 * d1 - s12 * d2)
                  + d2 * (s11 * d2 - s12 * d1))
               / (s11 * s22 - s12 * s12) AS t2
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(t2, 6) AS t2_stat,
           ROUND((n1 + n2 - 3.0) / ((n1 + n2 - 2.0) * 2) * t2, 6)
             AS f_stat,
           CAST(2 AS BIGINT) AS df1,
           CAST(n1 + n2 - 3 AS BIGINT) AS df2
    FROM t2
"""


@register("hotelling_t2_events", _HOTELLING_SQL)
def hotelling_t2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("x1"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("x2"),
    )
    lab = daily.where(
        F.col("x1").isNotNull() & F.col("x2").isNotNull()
    ).withColumn(
        "grp", F.when(F.dayofmonth("d") <= 15, F.lit(1)).otherwise(F.lit(2))
    )
    g = lab.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        (
            F.sum(F.col("x1") * F.col("x1"))
            - F.count("*") * F.avg("x1") * F.avg("x1")
        ).alias("ss11"),
        (
            F.sum(F.col("x2") * F.col("x2"))
            - F.count("*") * F.avg("x2") * F.avg("x2")
        ).alias("ss22"),
        (
            F.sum(F.col("x1") * F.col("x2"))
            - F.count("*") * F.avg("x1") * F.avg("x2")
        ).alias("ss12"),
    )
    pool = g.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 2, F.col("n"))).alias("n2"),
        (
            F.max(F.when(F.col("grp") == 1, F.col("m1")))
            - F.max(F.when(F.col("grp") == 2, F.col("m1")))
        ).alias("d1"),
        (
            F.max(F.when(F.col("grp") == 1, F.col("m2")))
            - F.max(F.when(F.col("grp") == 2, F.col("m2")))
        ).alias("d2"),
        F.sum("ss11").alias("p11"),
        F.sum("ss22").alias("p22"),
        F.sum("ss12").alias("p12"),
    )
    dof = F.col("n1") + F.col("n2") - 2
    s11 = F.col("p11") / dof
    s22 = F.col("p22") / dof
    s12 = F.col("p12") / dof
    t2 = (
        F.col("n1").cast("double")
        * F.col("n2")
        / (F.col("n1") + F.col("n2"))
        * (
            F.col("d1") * (s22 * F.col("d1") - s12 * F.col("d2"))
            + F.col("d2") * (s11 * F.col("d2") - s12 * F.col("d1"))
        )
        / (s11 * s22 - s12 * s12)
    )
    return pool.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(t2, 6).alias("t2_stat"),
        F.round(
            (F.col("n1") + F.col("n2") - 3.0)
            / ((F.col("n1") + F.col("n2") - 2.0) * 2)
            * t2,
            6,
        ).alias("f_stat"),
        F.lit(2).cast("long").alias("df1"),
        (F.col("n1") + F.col("n2") - 3).cast("long").alias("df2"),
    )
