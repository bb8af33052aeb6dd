"""Seventy-first oracle-registry module: rank correlation and survey
sampling design.

  * spearman_events — Spearman rank correlation between the value
    column and the props.k payload, with average-rank tie handling
    computed relationally (per distinct value: cumulative count below
    + (ties+1)/2 — the same machinery as the AUC op, applied to both
    variables), then Pearson over the ranks in raw-moment form.
    Completes the correlation triple: Pearson (stats_corr_lineitem),
    Kendall (ann_kendall_tau), Spearman (here).

  * neyman_allocation_events — Neyman optimal allocation of a
    fixed sampling budget (n=1000) across event-type strata:
    n_h ∝ N_h·S_h (stratum size × stratum std), emitted next to the
    proportional allocation n_h ∝ N_h it beats.  The design step in
    front of stratified_sample_docs; one hash aggregate for the
    stratum moments, everything else scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SPEAR_SQL = """
    WITH pts AS (
      SELECT value AS x,
             CAST(json_extract(props, '$.k') AS INTEGER) * 1.0 AS y
      FROM events
    ),
    rx AS (
      SELECT x, COUNT(*) AS cnt FROM pts GROUP BY x
    ),
    rx2 AS (
      SELECT x,
             COALESCE(SUM(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2.0 AS rank_x
      FROM rx
    ),
    ry AS (
      SELECT y, COUNT(*) AS cnt FROM pts GROUP BY y
    ),
    ry2 AS (
      SELECT y,
             COALESCE(SUM(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2.0 AS rank_y
      FROM ry
    ),
    ranked AS (
      SELECT rx2.rank_x AS a, ry2.rank_y AS b
      FROM pts JOIN rx2 ON pts.x = rx2.x JOIN ry2 ON pts.y = ry2.y
    )
    SELECT COUNT(*) AS n,
           ROUND((COUNT(*) * SUM(a * b) - SUM(a) * SUM(b))
                 / sqrt((COUNT(*) * SUM(a * a) - SUM(a) * SUM(a))
                        * (COUNT(*) * SUM(b * b) - SUM(b) * SUM(b))), 6) AS spearman_rho
    FROM ranked
"""


@register("spearman_events", _SPEAR_SQL)
def spearman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("value").alias("x"),
        (F.get_json_object("props", "$.k").cast("int") * 1.0).alias("y"),
    )

    def avg_ranks(df, col):
        per = df.groupBy(col).agg(F.count("*").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per.select(
            col,
            (
                F.coalesce(F.sum("cnt").over(w), F.lit(0)) + (F.col("cnt") + 1) / 2.0
            ).alias(f"rank_{col}"),
        )

    rx = avg_ranks(pts, "x")
    ry = avg_ranks(pts, "y")
    ranked = pts.join(rx, "x").join(ry, "y").select(
        F.col("rank_x").alias("a"), F.col("rank_y").alias("b")
    )
    n = F.count("*")
    num = n * F.sum(F.col("a") * F.col("b")) - F.sum("a") * F.sum("b")
    den = F.sqrt(
        (n * F.sum(F.col("a") * F.col("a")) - F.sum("a") * F.sum("a"))
        * (n * F.sum(F.col("b") * F.col("b")) - F.sum("b") * F.sum("b"))
    )
    return ranked.agg(
        F.count("*").alias("n"), F.round(num / den, 6).alias("spearman_rho")
    )


_NEYMAN_SQL = """
    WITH strata AS (
      SELECT event_type,
             COUNT(*) AS nh,
             sqrt((SUM(value * value) - COUNT(*) * AVG(value) * AVG(value))
                  / (COUNT(*) - 1.0)) AS sh
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(nh) AS n_total, SUM(nh * sh) AS sum_nhsh FROM strata
    )
    SELECT s.event_type, s.nh,
           ROUND(s.sh, 6) AS stratum_std,
           CAST(round(1000.0 * s.nh * s.sh / t.sum_nhsh) AS BIGINT) AS neyman_n,
           CAST(round(1000.0 * s.nh / t.n_total) AS BIGINT) AS proportional_n
    FROM strata s, tot t
"""


@register("neyman_allocation_events", _NEYMAN_SQL)
def neyman_allocation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    strata = ev.groupBy("event_type").agg(
        F.count("*").alias("nh"),
        F.sqrt(
            (F.sum(F.col("value") * F.col("value")) - F.count("*") * F.avg("value") * F.avg("value"))
            / (F.count("*") - 1.0)
        ).alias("sh"),
    )
    tot = strata.agg(
        F.sum("nh").alias("n_total"), F.sum(F.col("nh") * F.col("sh")).alias("sum_nhsh")
    )
    return strata.crossJoin(tot).select(
        "event_type",
        "nh",
        F.round("sh", 6).alias("stratum_std"),
        F.round(1000.0 * F.col("nh") * F.col("sh") / F.col("sum_nhsh"))
        .cast("long")
        .alias("neyman_n"),
        F.round(1000.0 * F.col("nh") / F.col("n_total")).cast("long").alias("proportional_n"),
    )
