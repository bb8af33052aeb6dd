"""Hundred-forty-second oracle-registry module: effect sizes — the
"how big", completing the "is it real" tests (mann_whitney_events,
welch_ttest_events) whose p-values go to zero at 10^12-row scale no
matter how tiny the difference; at web scale the effect size IS the
decision variable:

  * cliffs_delta_events — Cliff's delta between the click and view
    value samples: δ = (#{x>y} − #{x<y}) / (n₁n₂), computed from the
    same value-level aggregation as mann_whitney_events (per distinct
    value: click count a_v, view count b_v, cumulative view counts
    strictly below) — the dominance-pair counts come from a
    distinct-value-sized cumsum, never an n₁×n₂ pair join.  Ties
    contribute to neither count, per Cliff's definition.

  * cohens_d_events — Cohen's d with pooled SD between the same two
    samples, plus Hedges' g (the small-sample bias correction
    J = 1 − 3/(4·df − 1), df = n₁+n₂−2 — negligible here, emitted so
    a reader can see it is negligible).  Pure single-pass aggregates
    (count/avg/sum-of-squares per group), no window, no join beyond
    the final 2-row pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CLIFF_SQL = """
    WITH vals AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY value
    ),
    cum AS (
      SELECT value, a, b,
             COALESCE(SUM(b) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b_below,
             COALESCE(SUM(a) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS a_below
      FROM vals
    )
    SELECT CAST(SUM(a) AS BIGINT) AS n_click,
           CAST(SUM(b) AS BIGINT) AS n_view,
           ROUND((SUM(a * b_below) - SUM(b * a_below))
                 / (SUM(a) * 1.0 * SUM(b)), 6) AS cliffs_delta
    FROM cum
"""


@register("cliffs_delta_events", _CLIFF_SQL)
def cliffs_delta_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    vals = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("b"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "a",
        "b",
        F.coalesce(F.sum("b").over(w), F.lit(0)).alias("b_below"),
        F.coalesce(F.sum("a").over(w), F.lit(0)).alias("a_below"),
    )
    return cum.agg(
        F.sum("a").cast("long").alias("n_click"),
        F.sum("b").cast("long").alias("n_view"),
        F.round(
            (
                F.sum(F.col("a") * F.col("b_below"))
                - F.sum(F.col("b") * F.col("a_below"))
            )
            / (F.sum("a") * 1.0 * F.sum("b")),
            6,
        ).alias("cliffs_delta"),
    )


_COHEN_SQL = """
    WITH grp AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
             SUM(value * value) - COUNT(*) * POW(AVG(value), 2) AS ss
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    wide AS (
      SELECT MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
             MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
             MAX(CASE WHEN event_type = 'click' THEN m END) AS m1,
             MAX(CASE WHEN event_type = 'view' THEN m END) AS m2,
             MAX(CASE WHEN event_type = 'click' THEN ss END) AS ss1,
             MAX(CASE WHEN event_type = 'view' THEN ss END) AS ss2
      FROM grp
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_view,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT((ss1 + ss2) / (n1 + n2 - 2)), 6)
             AS cohens_d,
           ROUND((1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1))
                 * (m1 - m2) / SQRT((ss1 + ss2) / (n1 + n2 - 2)), 6)
             AS hedges_g
    FROM wide
"""


@register("cohens_d_events", _COHEN_SQL)
def cohens_d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    grp = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count("*") * F.pow(F.avg("value"), 2)
        ).alias("ss"),
    )
    wide = grp.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "click", F.col("m"))).alias("m1"),
        F.max(F.when(F.col("event_type") == "view", F.col("m"))).alias("m2"),
        F.max(F.when(F.col("event_type") == "click", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("event_type") == "view", F.col("ss"))).alias("ss2"),
    )
    d = (F.col("m1") - F.col("m2")) / F.sqrt(
        (F.col("ss1") + F.col("ss2")) / (F.col("n1") + F.col("n2") - 2)
    )
    return wide.select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(
            (1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2") - 2) - 1)) * d, 6
        ).alias("hedges_g"),
    )
