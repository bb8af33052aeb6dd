"""Hundred-forty-fifth oracle-registry module: capacity and
inventory planning — extending littles_law_events / newsvendor_events
with the two classical closed forms that turn measured load into a
sizing decision:

  * erlang_c_events — M/M/c wait probability over the measured event
    stream: arrival rate λ = events per observed minute, mean service
    time E[S] = mean event value (minutes), offered load a = λ·E[S];
    for c = ⌈a⌉+1 … ⌈a⌉+5 servers, Erlang C
    P_wait = (a^c/c!) / ((1−ρ)·Σ_{k<c} a^k/k! + a^c/c!), ρ = a/c,
    and the mean queueing delay Wq = P_wait/(c/E[S] − λ).  All terms
    in log space (k·ln a − ln k!) with the ln-factorial built by
    sequence + cumsum (fisher_exact discipline); the series length
    is ⌈a⌉+5 — data-dependent but load-sized, never row-sized.
    This is the "how many executors do I need so queueing delay
    stays sub-second" calculation applied to the event stream.

  * eoq_parts — economic order quantity per part brand from the
    lineitem demand join: D = period demand (Σ quantity), unit
    holding cost h = 0.2 × mean unit price, fixed order cost K=100,
    EOQ = √(2DK/h), implied order count D/EOQ and total policy cost
    √(2DKh).  One join + one brand-keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ERLANG_SQL = """
    WITH load AS (
      SELECT COUNT(*) * 60.0
               / (CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
                  - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT)) AS lam,
             AVG(value) AS es
      FROM events
    ),
    a AS (SELECT lam, es, lam * es AS a FROM load),
    cs AS (
      SELECT a.lam, a.es, a.a,
             CAST(CEIL(a.a) AS BIGINT) + u.i AS c
      FROM a CROSS JOIN (SELECT unnest(range(1, 6)) AS i) u
    ),
    ks AS (
      SELECT unnest(range(0, (SELECT CAST(CEIL(a) AS BIGINT) + 6 FROM a)))
        AS k
    ),
    lfact AS (
      SELECT k,
             SUM(CASE WHEN j > 0 THEN LN(CAST(j AS DOUBLE)) ELSE 0 END) AS lf
      FROM (SELECT a.k, b.k AS j FROM ks a JOIN ks b ON b.k <= a.k)
      GROUP BY k
    ),
    series AS (
      SELECT c.c, c.lam, c.es, c.a,
             SUM(CASE WHEN l.k < c.c
                 THEN EXP(l.k * LN(c.a) - l.lf) ELSE 0 END) AS s_below,
             MAX(CASE WHEN l.k = c.c
                 THEN EXP(l.k * LN(c.a) - l.lf) END) AS term_c
      FROM cs c JOIN lfact l ON l.k <= c.c
      GROUP BY c.c, c.lam, c.es, c.a
    )
    SELECT CAST(c AS BIGINT) AS c,
           ROUND(a / c, 6) AS rho,
           ROUND(term_c / ((1 - a / c) * s_below + term_c), 6) AS p_wait,
           ROUND(term_c / ((1 - a / c) * s_below + term_c)
                 / (c / es - lam), 6) AS wq_minutes
    FROM series ORDER BY c
"""


@register("erlang_c_events", _ERLANG_SQL)
def erlang_c_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    load = ev.agg(
        (
            F.count("*")
            * 60.0
            / (
                F.unix_timestamp(F.max("ts"))
                - F.unix_timestamp(F.min("ts"))
            )
        ).alias("lam"),
        F.avg("value").alias("es"),
    ).select("lam", "es", (F.col("lam") * F.col("es")).alias("a"))
    cs = load.select(
        "lam",
        "es",
        "a",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("i"),
    ).select(
        "lam",
        "es",
        "a",
        (F.ceil("a").cast("long") + F.col("i")).alias("c"),
    )
    ks = load.select(
        F.explode(
            F.sequence(F.lit(0), F.ceil("a").cast("long") + 5)
        ).alias("k")
    )
    lf = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    lfact = ks.select(
        "k",
        F.sum(
            F.when(F.col("k") > 0, F.log(F.col("k").cast("double"))).otherwise(
                0.0
            )
        )
        .over(lf)
        .alias("lf"),
    )
    series = (
        cs.join(F.broadcast(lfact), F.col("k") <= F.col("c"))
        .groupBy("c", "lam", "es", "a")
        .agg(
            F.sum(
                F.when(
                    F.col("k") < F.col("c"),
                    F.exp(F.col("k") * F.log("a") - F.col("lf")),
                ).otherwise(0.0)
            ).alias("s_below"),
            F.max(
                F.when(
                    F.col("k") == F.col("c"),
                    F.exp(F.col("k") * F.log("a") - F.col("lf")),
                )
            ).alias("term_c"),
        )
    )
    p_wait = F.col("term_c") / (
        (1 - F.col("a") / F.col("c")) * F.col("s_below") + F.col("term_c")
    )
    return series.select(
        F.col("c").cast("long").alias("c"),
        F.round(F.col("a") / F.col("c"), 6).alias("rho"),
        F.round(p_wait, 6).alias("p_wait"),
        F.round(
            p_wait / (F.col("c") / F.col("es") - F.col("lam")), 6
        ).alias("wq_minutes"),
    ).orderBy("c")


_EOQ_SQL = """
    WITH demand AS (
      SELECT p.p_brand,
             SUM(l.l_quantity) AS d,
             AVG(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    )
    SELECT p_brand,
           ROUND(d, 2) AS demand,
           ROUND(unit_price, 6) AS unit_price,
           ROUND(SQRT(2.0 * d * 100.0 / (0.2 * unit_price)), 6) AS eoq,
           ROUND(d / SQRT(2.0 * d * 100.0 / (0.2 * unit_price)), 6)
             AS n_orders,
           ROUND(SQRT(2.0 * d * 100.0 * 0.2 * unit_price), 6)
             AS policy_cost
    FROM demand ORDER BY p_brand
"""


@register("eoq_parts", _EOQ_SQL)
def eoq_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum("l_quantity").alias("d"),
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
        )
    )
    eoq = F.sqrt(2.0 * F.col("d") * 100.0 / (0.2 * F.col("unit_price")))
    return demand.select(
        "p_brand",
        F.round("d", 2).alias("demand"),
        F.round("unit_price", 6).alias("unit_price"),
        F.round(eoq, 6).alias("eoq"),
        F.round(F.col("d") / eoq, 6).alias("n_orders"),
        F.round(
            F.sqrt(2.0 * F.col("d") * 100.0 * 0.2 * F.col("unit_price")), 6
        ).alias("policy_cost"),
    ).orderBy("p_brand")
