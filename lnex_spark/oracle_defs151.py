"""Hundred-fifty-first oracle-registry module: stratified and ordered
categorical association — the two contingency tests the chi-square /
Fisher / Simpson suite still lacked.

  * cmh_events — Cochran-Mantel-Haenszel test of the click-vs-view ×
    high-value (value > 50) association stratified BY DAY, plus the
    Mantel-Haenszel common odds-ratio estimate.  Per stratum k:
    2x2 cells (a,b,c,d), CMH chi-square (with continuity correction)
    = (|sum a - sum E[a]| - 0.5)^2 / sum Var(a) where E[a] =
    r1*c1/n and Var(a) = r1*r2*c1*c2/(n^2(n-1)); OR_MH =
    sum(ad/n)/sum(bc/n).  The day-stratified defence against exactly
    the aggregation reversal simpson_check_events demonstrates —
    association controlled for the time confounder, computed with one
    groupBy and no per-row Python.

  * cochran_armitage_orders — Cochran-Armitage linear trend test of
    P(order finished: status 'F') across the ordered priority levels
    scored 1..5: T = sum_i s_i (a_i - n_i pbar), Var(T) =
    pbar(1-pbar)(sum n_i s_i^2 - (sum n_i s_i)^2 / N), z = T/sqrt(V),
    chi2 = z^2.  The dose-response test — detects a monotone
    completion-rate gradient over priority that a 5-df chi-square
    dilutes across unordered categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CMH_SQL = """
    WITH s AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CASE WHEN event_type = 'click' AND value > 50
                      THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN event_type = 'click' AND value <= 50
                      THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN event_type = 'view' AND value > 50
                      THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN event_type = 'view' AND value <= 50
                      THEN 1 ELSE 0 END) AS d_
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1
    ),
    k AS (
      SELECT a, b, c, d_, a + b + c + d_ AS n,
             a + b AS r1, c + d_ AS r2, a + c AS c1, b + d_ AS c2
      FROM s WHERE a + b > 0 AND c + d_ > 0 AND a + c > 0 AND b + d_ > 0
    ),
    agg AS (
      SELECT COUNT(*) AS strata,
             SUM(a) AS sa,
             SUM(CAST(r1 AS DOUBLE) * c1 / n) AS ea,
             SUM(CAST(r1 AS DOUBLE) * r2 * c1 * c2
                 / (CAST(n AS DOUBLE) * n * (n - 1))) AS va,
             SUM(CAST(a AS DOUBLE) * d_ / n) AS srn,
             SUM(CAST(b AS DOUBLE) * c / n) AS ssn
      FROM k
    )
    SELECT CAST(strata AS BIGINT) AS strata,
           ROUND((ABS(sa - ea) - 0.5) * (ABS(sa - ea) - 0.5) / va, 6)
             AS cmh_chi2,
           ROUND(srn / ssn, 6) AS or_mh
    FROM agg
"""


@register("cmh_events", _CMH_SQL)
def cmh_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    click = F.col("event_type") == "click"
    hi = F.col("value") > 50
    s = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.sum(F.when(click & hi, 1).otherwise(0)).alias("a"),
        F.sum(F.when(click & ~hi, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~click & hi, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~click & ~hi, 1).otherwise(0)).alias("d_"),
    )
    k = (
        s.withColumn("n", F.col("a") + F.col("b") + F.col("c") + F.col("d_"))
        .withColumn("r1", F.col("a") + F.col("b"))
        .withColumn("r2", F.col("c") + F.col("d_"))
        .withColumn("c1", F.col("a") + F.col("c"))
        .withColumn("c2", F.col("b") + F.col("d_"))
        .where(
            (F.col("r1") > 0)
            & (F.col("r2") > 0)
            & (F.col("c1") > 0)
            & (F.col("c2") > 0)
        )
    )
    agg = k.agg(
        F.count("*").alias("strata"),
        F.sum("a").alias("sa"),
        F.sum(F.col("r1").cast("double") * F.col("c1") / F.col("n")).alias("ea"),
        F.sum(
            F.col("r1").cast("double")
            * F.col("r2")
            * F.col("c1")
            * F.col("c2")
            / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
        ).alias("va"),
        F.sum(F.col("a").cast("double") * F.col("d_") / F.col("n")).alias("srn"),
        F.sum(F.col("b").cast("double") * F.col("c") / F.col("n")).alias("ssn"),
    )
    dev = F.abs(F.col("sa") - F.col("ea")) - 0.5
    return agg.select(
        F.col("strata").cast("long").alias("strata"),
        F.round(dev * dev / F.col("va"), 6).alias("cmh_chi2"),
        F.round(F.col("srn") / F.col("ssn"), 6).alias("or_mh"),
    )


_CA_SQL = """
    WITH g AS (
      SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS DOUBLE) AS s,
             COUNT(*) AS n,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n) AS nn, SUM(a) AS aa,
             CAST(SUM(a) AS DOUBLE) / SUM(n) AS pbar,
             SUM(s * a) AS sa, SUM(s * n) AS sn, SUM(s * s * n) AS ssn
      FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n,
           ROUND(pbar, 6) AS pbar,
           ROUND((sa - pbar * sn)
                 / SQRT(pbar * (1 - pbar) * (ssn - sn * sn / nn)), 6) AS z,
           ROUND((sa - pbar * sn) * (sa - pbar * sn)
                 / (pbar * (1 - pbar) * (ssn - sn * sn / nn)), 6)
             AS trend_chi2
    FROM tot
"""


@register("cochran_armitage_orders", _CA_SQL)
def cochran_armitage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("double").alias("s")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("a"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("a").alias("aa"),
        (F.sum("a").cast("double") / F.sum("n")).alias("pbar"),
        F.sum(F.col("s") * F.col("a")).alias("sa"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).alias("ssn"),
    )
    t = F.col("sa") - F.col("pbar") * F.col("sn")
    v = (
        F.col("pbar")
        * (1 - F.col("pbar"))
        * (F.col("ssn") - F.col("sn") * F.col("sn") / F.col("nn"))
    )
    return tot.select(
        F.col("nn").cast("long").alias("n"),
        F.round("pbar", 6).alias("pbar"),
        F.round(t / F.sqrt(v), 6).alias("z"),
        F.round(t * t / v, 6).alias("trend_chi2"),
    )
