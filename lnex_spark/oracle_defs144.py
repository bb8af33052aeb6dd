"""Hundred-forty-fourth oracle-registry module: post-hoc pairwise
comparisons — *which* groups differ, after kruskal_wallis_events /
anova only said *some* group differs:

  * dunn_test_events — Dunn's test on all C(5,2)=10 event-type
    pairs: mean ranks from the value-level average-rank table (the
    mann_whitney/kruskal construction — distinct-value-sized
    shuffle), z_ij = (R̄_i − R̄_j) / √((N(N+1)/12 − Σ(t³−t)/(12(N−1)))
    ·(1/n_i + 1/n_j)) with the exact tie correction.  Emits each
    pair's z plus its Holm step-down order (rank by |z| descending —
    the order in which a Holm procedure would test them); z is left
    un-p-valued like welch/kruskal (no normal CDF in common SQL).

  * tukey_hsd_events — the parametric counterpart: studentized-range
    statistics q_ij = |m_i − m_j| / √(MSE/2 · (1/n_i + 1/n_j)) with
    MSE the pooled within-group variance from the one-way ANOVA
    identity.  One group-level aggregate, then a 5×5 upper-triangle
    self-join of the 5-row summary — broadcast-trivial at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DUNN_SQL = """
    WITH vals AS (
      SELECT value, event_type, COUNT(*) AS c
      FROM events GROUP BY value, event_type
    ),
    vtot AS (
      SELECT value, SUM(c) AS t FROM vals GROUP BY value
    ),
    ranked AS (
      SELECT value, t,
             COALESCE(SUM(t) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (t + 1) / 2.0 AS rank_avg
      FROM vtot
    ),
    grp AS (
      SELECT v.event_type, SUM(v.c) AS n_g,
             SUM(v.c * r.rank_avg) / SUM(v.c) AS rbar_g
      FROM vals v JOIN ranked r ON v.value = r.value
      GROUP BY v.event_type
    ),
    tot AS (
      SELECT SUM(n_g) AS n,
             (SELECT SUM(POW(t, 3) - t) FROM ranked) AS tie_term
      FROM grp
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             (a.rbar_g - b.rbar_g)
             / SQRT((t.n * (t.n + 1) / 12.0
                     - t.tie_term / (12.0 * (t.n - 1)))
                    * (1.0 / a.n_g + 1.0 / b.n_g)) AS z
      FROM grp a JOIN grp b ON a.event_type < b.event_type
      CROSS JOIN tot t
    )
    SELECT type_a, type_b, ROUND(z, 6) AS z,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, type_a, type_b)
                AS BIGINT) AS holm_order
    FROM pairs ORDER BY type_a, type_b
"""


@register("dunn_test_events", _DUNN_SQL)
def dunn_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    vals = ev.groupBy("value", "event_type").agg(F.count("*").alias("c"))
    vtot = vals.groupBy("value").agg(F.sum("c").alias("t"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vtot.select(
        "value",
        "t",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0))
            + (F.col("t") + 1) / 2.0
        ).alias("rank_avg"),
    )
    grp = (
        vals.join(ranked.select("value", "rank_avg"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n_g"),
            (F.sum(F.col("c") * F.col("rank_avg")) / F.sum("c")).alias(
                "rbar_g"
            ),
        )
    )
    tie = ranked.agg(F.sum(F.pow("t", 3) - F.col("t")).alias("tie_term"))
    tot = grp.agg(F.sum("n_g").alias("n")).crossJoin(F.broadcast(tie))
    a = grp.select(
        F.col("event_type").alias("type_a"),
        F.col("n_g").alias("na"),
        F.col("rbar_g").alias("ra"),
    )
    b = grp.select(
        F.col("event_type").alias("type_b"),
        F.col("n_g").alias("nb"),
        F.col("rbar_g").alias("rb"),
    )
    pairs = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            (
                (F.col("ra") - F.col("rb"))
                / F.sqrt(
                    (
                        F.col("n") * (F.col("n") + 1) / 12.0
                        - F.col("tie_term") / (12.0 * (F.col("n") - 1))
                    )
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                )
            ).alias("z_raw"),
        )
    )
    wh = Window.orderBy(F.abs(F.col("z_raw")).desc(), "type_a", "type_b")
    return pairs.select(
        "type_a",
        "type_b",
        F.round("z_raw", 6).alias("z"),
        F.row_number().over(wh).cast("long").alias("holm_order"),
    ).orderBy("type_a", "type_b")


_TUKEY_SQL = """
    WITH grp AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
             SUM(value * value) - COUNT(*) * POW(AVG(value), 2) AS ss
      FROM events GROUP BY event_type
    ),
    mse AS (
      SELECT SUM(ss) / (SUM(n) - COUNT(*)) AS mse FROM grp
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           ROUND(a.m - b.m, 6) AS mean_diff,
           ROUND(ABS(a.m - b.m)
                 / SQRT(t.mse / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6) AS q
    FROM grp a JOIN grp b ON a.event_type < b.event_type
    CROSS JOIN mse t
    ORDER BY type_a, type_b
"""


@register("tukey_hsd_events", _TUKEY_SQL)
def tukey_hsd_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    grp = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count("*") * F.pow(F.avg("value"), 2)
        ).alias("ss"),
    )
    mse = grp.agg(
        (F.sum("ss") / (F.sum("n") - F.count("*"))).alias("mse")
    )
    a = grp.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
    )
    b = grp.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "type_a",
            "type_b",
            F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
            F.round(
                F.abs(F.col("ma") - F.col("mb"))
                / F.sqrt(
                    F.col("mse")
                    / 2.0
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                6,
            ).alias("q"),
        )
        .orderBy("type_a", "type_b")
    )
