"""Hundred-eighty-sixth oracle-registry module: ordered-alternative
rank tests — when the hypothesis is not "some group differs" but
"the groups TREND in a known order", these dominate Friedman /
Kruskal-Wallis in power.

  * page_trend_events — Page's L test with event types as blocks
    and the month's five weeks as ordered treatments: weekly mean
    value per (type, week) ROUNDED to 6, tie-stable average ranks
    within each block, L = sum_w w * R_w, with the exact null mean
    b k (k+1)^2 / 4 and variance b k^2 (k+1)(k^2-1) / 144 → z.
    Detects a monotone week-over-week drift that friedman_events
    (order-blind) dilutes across its omnibus alternative.

  * jonckheere_orders — Jonckheere-Terpstra test of a monotone
    o_totalprice trend across the ordered priority levels 1..5,
    on the monthly-mean panel (one observation per priority x
    month, bounded at every scale factor): U = sum over ordered
    group pairs of #(x_i < x_j) + 0.5 #(=) via an explicit pairwise
    join, with exact null moments E[U] = (N^2 - sum n^2)/4 and
    Var = (N^2(2N+3) - sum n^2(2n+3))/72 → z.  The
    independent-samples dual of Page's blocked design;
    cochran_armitage_orders is its binary-outcome special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PAGE_SQL = """
    WITH cell AS (
      SELECT event_type AS blk,
             LEAST(CAST(FLOOR((EXTRACT(day FROM ts) - 1) / 7) AS INTEGER)
                   + 1, 5) AS wk,
             ROUND(AVG(value), 6) AS m
      FROM events GROUP BY 1, 2
    ),
    full_blocks AS (
      SELECT blk FROM cell GROUP BY blk
      HAVING COUNT(*) = (SELECT MAX(c) FROM
                         (SELECT COUNT(*) AS c FROM cell GROUP BY blk))
    ),
    ranked AS (
      SELECT c.blk, c.wk,
             (2.0 * RANK() OVER (PARTITION BY c.blk ORDER BY c.m)
              + COUNT(*) OVER (PARTITION BY c.blk, c.m) - 1) / 2 AS r
      FROM cell c JOIN full_blocks f ON f.blk = c.blk
    ),
    lsum AS (
      SELECT SUM(wk * r) AS l,
             COUNT(DISTINCT blk) AS b,
             COUNT(DISTINCT wk) AS k
      FROM ranked
    )
    SELECT CAST(b AS BIGINT) AS blocks, CAST(k AS BIGINT) AS treatments,
           ROUND(l, 2) AS page_l,
           ROUND(b * k * (k + 1) * (k + 1) / 4.0, 2) AS e_l,
           ROUND((l - b * k * (k + 1) * (k + 1) / 4.0)
                 / SQRT(b * CAST(k AS DOUBLE) * k * (k + 1)
                        * (k * k - 1) / 144.0), 6) AS z
    FROM lsum
"""


@register("page_trend_events", _PAGE_SQL)
def page_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("blk"),
        F.least(
            (((F.dayofmonth("ts") - 1) / 7).cast("int") + 1), F.lit(5)
        ).alias("wk"),
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    maxc = cell.groupBy("blk").count().agg(F.max("count").alias("mc"))
    full_blocks = (
        cell.groupBy("blk")
        .count()
        .crossJoin(F.broadcast(maxc))
        .where(F.col("count") == F.col("mc"))
        .select("blk")
    )
    wr = Window.partitionBy("blk").orderBy("m")
    wt = Window.partitionBy("blk", "m")
    ranked = cell.join(full_blocks, "blk").select(
        "blk",
        "wk",
        ((2.0 * F.rank().over(wr) + F.count("*").over(wt) - 1) / 2).alias("r"),
    )
    lsum = ranked.agg(
        F.sum(F.col("wk") * F.col("r")).alias("l"),
        F.countDistinct("blk").alias("b"),
        F.countDistinct("wk").alias("k"),
    )
    el = F.col("b") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1) / 4.0
    varl = (
        F.col("b")
        * F.col("k").cast("double")
        * F.col("k")
        * (F.col("k") + 1)
        * (F.col("k") * F.col("k") - 1)
        / 144.0
    )
    return lsum.select(
        F.col("b").cast("long").alias("blocks"),
        F.col("k").cast("long").alias("treatments"),
        F.round("l", 2).alias("page_l"),
        F.round(el, 2).alias("e_l"),
        F.round((F.col("l") - el) / F.sqrt(varl), 6).alias("z"),
    )


_JT_SQL = """
    WITH obs AS (
      SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS g,
             date_trunc('month', o_orderdate) AS m,
             ROUND(AVG(o_totalprice), 6) AS x
      FROM orders GROUP BY 1, 2
    ),
    sizes AS (SELECT g, COUNT(*) AS n FROM obs GROUP BY g),
    nn AS (SELECT SUM(n) AS nn, SUM(CAST(n AS DOUBLE) * n) AS sn2,
                  SUM(CAST(n AS DOUBLE) * n * (2 * n + 3)) AS sn23
           FROM sizes),
    u AS (
      SELECT SUM(CASE WHEN a.x < b.x THEN 1.0
                      WHEN a.x = b.x THEN 0.5 ELSE 0 END) AS u
      FROM obs a JOIN obs b ON a.g < b.g
    )
    SELECT ROUND(CAST(u.u AS DOUBLE), 1) AS jt_u,
           ROUND((n.nn * n.nn - n.sn2) / 4.0, 1) AS e_u,
           ROUND((n.nn * n.nn * (2 * n.nn + 3) - n.sn23) / 72.0, 4)
             AS var_u,
           ROUND((u.u - (n.nn * n.nn - n.sn2) / 4.0)
                 / SQRT((n.nn * n.nn * (2 * n.nn + 3) - n.sn23) / 72.0), 6)
             AS z
    FROM u CROSS JOIN nn n
"""


@register("jonckheere_orders", _JT_SQL)
def jonckheere_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.date_trunc("month", "o_orderdate").alias("m"),
    ).agg(F.round(F.avg("o_totalprice"), 6).alias("x"))
    sizes = obs.groupBy("g").agg(F.count("*").alias("n"))
    nn = sizes.agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("sn2"),
        F.sum(
            F.col("n").cast("double") * F.col("n") * (2 * F.col("n") + 3)
        ).alias("sn23"),
    )
    a = obs.select(F.col("g").alias("ga"), F.col("x").alias("xa"))
    b = obs.select(F.col("g").alias("gb"), F.col("x").alias("xb"))
    u = a.join(b, F.col("ga") < F.col("gb")).agg(
        F.sum(
            F.when(F.col("xa") < F.col("xb"), 1.0)
            .when(F.col("xa") == F.col("xb"), 0.5)
            .otherwise(0.0)
        ).alias("u")
    )
    eu = (F.col("nn") * F.col("nn") - F.col("sn2")) / 4.0
    varu = (
        F.col("nn") * F.col("nn") * (2 * F.col("nn") + 3) - F.col("sn23")
    ) / 72.0
    return u.crossJoin(F.broadcast(nn)).select(
        F.round("u", 1).alias("jt_u"),
        F.round(eu, 1).alias("e_u"),
        F.round(varu, 4).alias("var_u"),
        F.round((F.col("u") - eu) / F.sqrt(varu), 6).alias("z"),
    )
