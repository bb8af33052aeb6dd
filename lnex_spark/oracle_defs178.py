"""Hundred-seventy-eighth oracle-registry module: decomposition
methods — splitting an observed gap into its explainable parts, the
workhorse of metric-regression postmortems.

  * oaxaca_blinder_events — Oaxaca-Blinder decomposition of the
    purchase-vs-view mean value gap with the props key k as the
    explanatory covariate: per-group closed-form OLS y = a + b x,
    gap = ybar1 - ybar2 = explained (xbar1 - xbar2) b2 +
    unexplained (a1 - a2 + xbar1 (b1 - b2)).  The standard answer
    to "how much of the metric gap between cohorts is composition
    (different x) vs behavior (different response)" — the
    regression-adjusted sibling of did_events.

  * kitagawa_events — Kitagawa (rate/mix) decomposition of the
    overall error-rate change between the first and second half of
    the month, stratified by user-id decile segment: delta = sum_s
    wbar_s (r2s - r1s)   [rate component, within-segment changes]
    + sum_s rbar_s (w2s - w1s)   [mix component, traffic shifts],
    with wbar/rbar the across-period averages (the symmetric
    Kitagawa weights, so the two components sum EXACTLY to the
    observed delta — emitted as an identity check).  The first
    question of every "error rate moved" incident review: did
    segments get worse, or did traffic move to worse segments?
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_OAXACA_SQL = """
    WITH base AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS g,
             value AS y,
             CAST(json_extract(props, '$.k') AS DOUBLE) AS x
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    fit AS (
      SELECT g, COUNT(*) AS n, AVG(x) AS xb, AVG(y) AS yb,
             (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS b
      FROM base GROUP BY g
    ),
    flat AS (
      SELECT MAX(CASE WHEN g = 1 THEN n END) AS n1,
             MAX(CASE WHEN g = 2 THEN n END) AS n2,
             MAX(CASE WHEN g = 1 THEN xb END) AS x1,
             MAX(CASE WHEN g = 2 THEN xb END) AS x2,
             MAX(CASE WHEN g = 1 THEN yb END) AS y1,
             MAX(CASE WHEN g = 2 THEN yb END) AS y2,
             MAX(CASE WHEN g = 1 THEN b END) AS b1,
             MAX(CASE WHEN g = 2 THEN b END) AS b2
      FROM fit
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(y1 - y2, 6) AS gap,
           ROUND((x1 - x2) * b2, 6) AS explained,
           ROUND((y1 - x1 * b1) - (y2 - x2 * b2)
                 + x1 * (b1 - b2), 6) AS unexplained,
           ROUND(ABS(y1 - y2 - ((x1 - x2) * b2
                 + (y1 - x1 * b1) - (y2 - x2 * b2)
                 + x1 * (b1 - b2))), 9) AS identity_resid
    FROM flat
"""


@register("oaxaca_blinder_events", _OAXACA_SQL)
def oaxaca_blinder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    base = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(2).alias("g"),
        F.col("value").alias("y"),
        F.get_json_object("props", "$.k").cast("double").alias("x"),
    )
    fit = base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xb"),
        F.avg("y").alias("yb"),
        (
            (F.sum(F.col("x") * F.col("y")) - F.count("*") * F.avg("x") * F.avg("y"))
            / (F.sum(F.col("x") * F.col("x")) - F.count("*") * F.avg("x") * F.avg("x"))
        ).alias("b"),
    )
    m = lambda g, c: F.max(F.when(F.col("g") == g, F.col(c)))
    flat = fit.agg(
        m(1, "n").alias("n1"),
        m(2, "n").alias("n2"),
        m(1, "xb").alias("x1"),
        m(2, "xb").alias("x2"),
        m(1, "yb").alias("y1"),
        m(2, "yb").alias("y2"),
        m(1, "b").alias("b1"),
        m(2, "b").alias("b2"),
    )
    explained = (F.col("x1") - F.col("x2")) * F.col("b2")
    unexplained = (
        (F.col("y1") - F.col("x1") * F.col("b1"))
        - (F.col("y2") - F.col("x2") * F.col("b2"))
        + F.col("x1") * (F.col("b1") - F.col("b2"))
    )
    return flat.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.col("y1") - F.col("y2"), 6).alias("gap"),
        F.round(explained, 6).alias("explained"),
        F.round(unexplained, 6).alias("unexplained"),
        F.round(
            F.abs(F.col("y1") - F.col("y2") - (explained + unexplained)), 9
        ).alias("identity_resid"),
    )


_KITAGAWA_SQL = """
    WITH base AS (
      SELECT CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 2 END AS p,
             CAST(user_id % 10 AS INTEGER) AS seg,
             CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS e
      FROM events
    ),
    cell AS (
      SELECT p, seg, COUNT(*) AS n, AVG(e) AS r FROM base GROUP BY p, seg
    ),
    ptot AS (
      SELECT p, SUM(n) AS np FROM cell GROUP BY p
    ),
    wr AS (
      SELECT c.seg,
             MAX(CASE WHEN c.p = 1 THEN CAST(c.n AS DOUBLE) / t.np END)
               AS w1,
             MAX(CASE WHEN c.p = 2 THEN CAST(c.n AS DOUBLE) / t.np END)
               AS w2,
             MAX(CASE WHEN c.p = 1 THEN c.r END) AS r1,
             MAX(CASE WHEN c.p = 2 THEN c.r END) AS r2
      FROM cell c JOIN ptot t ON t.p = c.p
      GROUP BY c.seg
    ),
    ok AS (
      SELECT seg, COALESCE(w1, 0) AS w1, COALESCE(w2, 0) AS w2,
             COALESCE(r1, 0) AS r1, COALESCE(r2, 0) AS r2
      FROM wr
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(SUM(w2 * r2) - SUM(w1 * r1), 6) AS delta,
           ROUND(SUM((w1 + w2) / 2 * (r2 - r1)), 6) AS rate_component,
           ROUND(SUM((r1 + r2) / 2 * (w2 - w1)), 6) AS mix_component,
           ROUND(ABS(SUM(w2 * r2) - SUM(w1 * r1)
                 - SUM((w1 + w2) / 2 * (r2 - r1))
                 - SUM((r1 + r2) / 2 * (w2 - w1))), 9) AS identity_resid
    FROM ok
"""


@register("kitagawa_events", _KITAGAWA_SQL)
def kitagawa_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(2).alias("p"),
        (F.col("user_id") % 10).cast("int").alias("seg"),
        F.when(F.col("event_type") == "error", 1.0).otherwise(0.0).alias("e"),
    )
    cell = base.groupBy("p", "seg").agg(
        F.count("*").alias("n"), F.avg("e").alias("r")
    )
    ptot = cell.groupBy("p").agg(F.sum("n").alias("np"))
    j = cell.join(F.broadcast(ptot), "p")
    m = lambda p, c: F.max(F.when(F.col("p") == p, c))
    wr = j.groupBy("seg").agg(
        m(1, F.col("n").cast("double") / F.col("np")).alias("w1"),
        m(2, F.col("n").cast("double") / F.col("np")).alias("w2"),
        m(1, F.col("r")).alias("r1"),
        m(2, F.col("r")).alias("r2"),
    )
    ok = wr.select(
        "seg",
        F.coalesce("w1", F.lit(0.0)).alias("w1"),
        F.coalesce("w2", F.lit(0.0)).alias("w2"),
        F.coalesce("r1", F.lit(0.0)).alias("r1"),
        F.coalesce("r2", F.lit(0.0)).alias("r2"),
    )
    delta = F.sum(F.col("w2") * F.col("r2")) - F.sum(F.col("w1") * F.col("r1"))
    rate = F.sum((F.col("w1") + F.col("w2")) / 2 * (F.col("r2") - F.col("r1")))
    mix = F.sum((F.col("r1") + F.col("r2")) / 2 * (F.col("w2") - F.col("w1")))
    return ok.agg(
        F.count("*").cast("long").alias("n_segments"),
        F.round(delta, 6).alias("delta"),
        F.round(rate, 6).alias("rate_component"),
        F.round(mix, 6).alias("mix_component"),
        F.round(F.abs(delta - rate - mix), 9).alias("identity_resid"),
    )
