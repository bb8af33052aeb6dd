"""Hundred-eighty-first oracle-registry module: trade-flow economics
over the full customer→orders→lineitem→supplier→nation join graph —
two classics that exercise the engine's multi-way join path with a
closed-form model on top.

  * gravity_trade_flows — gravity model of the customer-nation ×
    supplier-nation revenue flows: flow_ij from the 5-table join,
    masses = each nation's total revenue as buyer / seller, distance
    proxy = |nationkey_i - nationkey_j| + 1 (deterministic ring
    metric).  Two-predictor closed-form OLS of ln(flow) on
    ln(mass_i * mass_j) and ln(dist) via the centered 2x2 normal
    equations — reporting the mass elasticity (theory: ≈ 1) and the
    distance coefficient.  The join itself is the point at scale:
    broadcast nation/supplier dims, one shuffle on orderkey.

  * balassa_rca — Balassa revealed-comparative-advantage index per
    (supplier nation, part type-class): RCA = (x_ns / x_n) /
    (x_s / x_total); RCA > 1 → the nation is relatively specialized
    in that class.  Emits the top 20 (nation, class) pairs by RCA
    with supports — the specialization matrix trade economists and
    category managers both read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_GRAVITY_SQL = """
    WITH flows AS (
      SELECT c.c_nationkey AS ni, s.s_nationkey AS nj,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS f
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    mass_i AS (SELECT ni, SUM(f) AS mi FROM flows GROUP BY ni),
    mass_j AS (SELECT nj, SUM(f) AS mj FROM flows GROUP BY nj),
    xy AS (
      SELECT LN(fl.f) AS y,
             LN(mi.mi * mj.mj) AS x1,
             LN(ABS(fl.ni - fl.nj) + 1.0) AS x2
      FROM flows fl
      JOIN mass_i mi ON mi.ni = fl.ni
      JOIN mass_j mj ON mj.nj = fl.nj
      WHERE fl.f > 0
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(y) AS yb, AVG(x1) AS x1b, AVG(x2) AS x2b,
             SUM(x1 * x1) - COUNT(*) * AVG(x1) * AVG(x1) AS s11,
             SUM(x2 * x2) - COUNT(*) * AVG(x2) * AVG(x2) AS s22,
             SUM(x1 * x2) - COUNT(*) * AVG(x1) * AVG(x2) AS s12,
             SUM(x1 * y) - COUNT(*) * AVG(x1) * AVG(y) AS s1y,
             SUM(x2 * y) - COUNT(*) * AVG(x2) * AVG(y) AS s2y
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_flows,
           ROUND((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6)
             AS mass_elasticity,
           ROUND((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6)
             AS distance_coef,
           ROUND(yb - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * x1b
                    - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * x2b,
                 6) AS intercept
    FROM mom
"""


@register("gravity_trade_flows", _GRAVITY_SQL)
def gravity_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    flows = (
        F.broadcast(c)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("ni"),
            F.col("s_nationkey").alias("nj"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("f")
        )
    )
    mass_i = flows.groupBy("ni").agg(F.sum("f").alias("mi"))
    mass_j = flows.groupBy("nj").agg(F.sum("f").alias("mj"))
    xy = (
        flows.where(F.col("f") > 0)
        .join(F.broadcast(mass_i), "ni")
        .join(F.broadcast(mass_j), "nj")
        .select(
            F.log("f").alias("y"),
            F.log(F.col("mi") * F.col("mj")).alias("x1"),
            F.log(F.abs(F.col("ni") - F.col("nj")) + 1.0).alias("x2"),
        )
    )
    mom = xy.agg(
        F.count("*").alias("n"),
        F.avg("y").alias("yb"),
        F.avg("x1").alias("x1b"),
        F.avg("x2").alias("x2b"),
        (F.sum(F.col("x1") * F.col("x1")) - F.count("*") * F.avg("x1") * F.avg("x1")).alias("s11"),
        (F.sum(F.col("x2") * F.col("x2")) - F.count("*") * F.avg("x2") * F.avg("x2")).alias("s22"),
        (F.sum(F.col("x1") * F.col("x2")) - F.count("*") * F.avg("x1") * F.avg("x2")).alias("s12"),
        (F.sum(F.col("x1") * F.col("y")) - F.count("*") * F.avg("x1") * F.avg("y")).alias("s1y"),
        (F.sum(F.col("x2") * F.col("y")) - F.count("*") * F.avg("x2") * F.avg("y")).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    return mom.select(
        F.col("n").cast("long").alias("n_flows"),
        F.round(b1, 6).alias("mass_elasticity"),
        F.round(b2, 6).alias("distance_coef"),
        F.round(
            F.col("yb") - b1 * F.col("x1b") - b2 * F.col("x2b"), 6
        ).alias("intercept"),
    )


_RCA_SQL = """
    WITH x AS (
      SELECT s.s_nationkey AS nation,
             split_part(p.p_type, ' ', 1) AS cls,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    xn AS (SELECT nation, SUM(v) AS vn FROM x GROUP BY nation),
    xs AS (SELECT cls, SUM(v) AS vs FROM x GROUP BY cls),
    tot AS (SELECT SUM(v) AS vt FROM x)
    SELECT x.nation, x.cls,
           ROUND(x.v, 2) AS flow,
           ROUND((x.v / n.vn) / (s.vs / (SELECT vt FROM tot)), 6) AS rca
    FROM x
    JOIN xn n ON n.nation = x.nation
    JOIN xs s ON s.cls = x.cls
    ORDER BY rca DESC, x.nation, x.cls
    LIMIT 20
"""


@register("balassa_rca", _RCA_SQL)
def balassa_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    x = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("cls"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("v")
        )
    )
    xn = x.groupBy("nation").agg(F.sum("v").alias("vn"))
    xs = x.groupBy("cls").agg(F.sum("v").alias("vs"))
    tot = x.agg(F.sum("v").alias("vt"))
    return (
        x.join(F.broadcast(xn), "nation")
        .join(F.broadcast(xs), "cls")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "cls",
            F.round("v", 2).alias("flow"),
            F.round(
                (F.col("v") / F.col("vn")) / (F.col("vs") / F.col("vt")), 6
            ).alias("rca"),
        )
        .orderBy(F.desc("rca"), "nation", "cls")
        .limit(20)
    )
