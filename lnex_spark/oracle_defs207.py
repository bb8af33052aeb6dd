"""Two-hundred-seventh oracle-registry module: non-parametric
efficiency and composite-indicator construction — benchmarking
entities without a parametric model.

  * fdh_efficiency_docs — Free Disposal Hull input-efficiency of
    each source: input = total characters, output = distinct token
    types; theta_s = min over sources v that produce AT LEAST as
    many types of (chars_v / chars_s), capped at 1.  theta = 1 →
    on the frontier (no source gets the same vocabulary cheaper);
    theta = 0.6 → 40% of the bytes are waste relative to a
    dominating peer.  DEA's assumption-free cousin — a plain
    dominance join, no LP.

  * composite_index_nations — an HDI-style composite indicator per
    customer nation from three sub-indicators (total order revenue,
    order count, mean account balance): min-max normalize each
    across nations (ROUNDED to 6), then combine by GEOMETRIC mean
    (the OECD-recommended aggregator — non-compensatory: a zero on
    any dimension zeroes the index, unlike the arithmetic mean
    which lets one dimension buy off another).  Emits both
    aggregators and the rank flips between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FDH_SQL = """
    WITH chars AS (
      SELECT source, SUM(n_chars) AS input_chars
      FROM documents GROUP BY source
    ),
    types AS (
      SELECT source, COUNT(DISTINCT tok) AS output_types
      FROM (
        SELECT source, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
      GROUP BY source
    ),
    units AS (
      SELECT c.source, c.input_chars, t.output_types
      FROM chars c JOIN types t ON t.source = c.source
    ),
    theta AS (
      SELECT a.source, a.input_chars, a.output_types,
             LEAST(MIN(CAST(b.input_chars AS DOUBLE) / a.input_chars), 1)
               AS theta
      FROM units a JOIN units b
        ON b.output_types >= a.output_types
      GROUP BY a.source, a.input_chars, a.output_types
    )
    SELECT source,
           CAST(input_chars AS BIGINT) AS input_chars,
           CAST(output_types AS BIGINT) AS output_types,
           ROUND(theta, 6) AS fdh_efficiency,
           CASE WHEN theta >= 1 THEN 1 ELSE 0 END AS on_frontier
    FROM theta
    ORDER BY source
"""

@register("fdh_efficiency_docs", _FDH_SQL)
def fdh_efficiency_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    chars = d.groupBy("source").agg(
        F.sum("n_chars").alias("input_chars")
    )
    types = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("output_types")
    )
    units = chars.join(types, "source")
    a = units.alias("a")
    b = units.alias("b")
    theta = (
        a.join(b, F.col("b.output_types") >= F.col("a.output_types"))
        .groupBy(
            F.col("a.source").alias("source"),
            F.col("a.input_chars").alias("input_chars"),
            F.col("a.output_types").alias("output_types"),
        )
        .agg(
            F.least(
                F.min(
                    F.col("b.input_chars").cast("double")
                    / F.col("a.input_chars")
                ),
                F.lit(1.0),
            ).alias("theta")
        )
    )
    return theta.select(
        "source",
        F.col("input_chars").cast("long").alias("input_chars"),
        F.col("output_types").cast("long").alias("output_types"),
        F.round("theta", 6).alias("fdh_efficiency"),
        F.when(F.col("theta") >= 1, 1).otherwise(0).alias("on_frontier"),
    ).orderBy("source")


_COMPOSITE_SQL = """
    WITH base AS (
      SELECT c.c_nationkey AS nation,
             ROUND(SUM(o.o_totalprice), 2) AS rev,
             COUNT(*) AS cnt,
             ROUND(AVG(c.c_acctbal), 6) AS bal
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    rng AS (
      SELECT MIN(rev) AS rev0, MAX(rev) AS rev1,
             MIN(cnt) AS cnt0, MAX(cnt) AS cnt1,
             MIN(bal) AS bal0, MAX(bal) AS bal1
      FROM base
    ),
    norm AS (
      SELECT b.nation,
             ROUND((b.rev - r.rev0) / NULLIF(r.rev1 - r.rev0, 0), 6) AS i1,
             ROUND(CAST(b.cnt - r.cnt0 AS DOUBLE)
                   / NULLIF(r.cnt1 - r.cnt0, 0), 6) AS i2,
             ROUND((b.bal - r.bal0) / NULLIF(r.bal1 - r.bal0, 0), 6) AS i3
      FROM base b CROSS JOIN rng r
    ),
    idx AS (
      SELECT nation, i1, i2, i3,
             (i1 + i2 + i3) / 3 AS arith,
             CASE WHEN i1 > 0 AND i2 > 0 AND i3 > 0
                  THEN EXP((LN(i1) + LN(i2) + LN(i3)) / 3)
                  ELSE 0 END AS geom
      FROM norm
    )
    SELECT nation,
           ROUND(i1, 6) AS norm_revenue,
           ROUND(i2, 6) AS norm_orders,
           ROUND(i3, 6) AS norm_balance,
           ROUND(arith, 6) AS index_arith,
           ROUND(geom, 6) AS index_geom,
           CAST(RANK() OVER (ORDER BY arith DESC) AS BIGINT) AS rank_arith,
           CAST(RANK() OVER (ORDER BY geom DESC) AS BIGINT) AS rank_geom
    FROM idx
    ORDER BY nation
"""


@register("composite_index_nations", _COMPOSITE_SQL)
def composite_index_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    base = (
        F.broadcast(c)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
            F.count("*").alias("cnt"),
            F.round(F.avg("c_acctbal"), 6).alias("bal"),
        )
    )
    rng = base.agg(
        F.min("rev").alias("rev0"),
        F.max("rev").alias("rev1"),
        F.min("cnt").alias("cnt0"),
        F.max("cnt").alias("cnt1"),
        F.min("bal").alias("bal0"),
        F.max("bal").alias("bal1"),
    )
    nz = lambda x: F.when(x != 0, x)
    norm = base.crossJoin(F.broadcast(rng)).select(
        "nation",
        F.round(
            (F.col("rev") - F.col("rev0")) / nz(F.col("rev1") - F.col("rev0")),
            6,
        ).alias("i1"),
        F.round(
            (F.col("cnt") - F.col("cnt0")).cast("double")
            / nz(F.col("cnt1") - F.col("cnt0")),
            6,
        ).alias("i2"),
        F.round(
            (F.col("bal") - F.col("bal0")) / nz(F.col("bal1") - F.col("bal0")),
            6,
        ).alias("i3"),
    )
    pos = (
        (F.col("i1") > 0) & (F.col("i2") > 0) & (F.col("i3") > 0)
    )
    idx = norm.select(
        "nation",
        "i1",
        "i2",
        "i3",
        ((F.col("i1") + F.col("i2") + F.col("i3")) / 3).alias("arith"),
        F.when(
            pos,
            F.exp(
                (F.log("i1") + F.log("i2") + F.log("i3")) / 3
            ),
        )
        .otherwise(0.0)
        .alias("geom"),
    )
    return idx.select(
        "nation",
        F.round("i1", 6).alias("norm_revenue"),
        F.round("i2", 6).alias("norm_orders"),
        F.round("i3", 6).alias("norm_balance"),
        F.round("arith", 6).alias("index_arith"),
        F.round("geom", 6).alias("index_geom"),
        F.rank().over(Window.orderBy(F.desc("arith"))).cast("long").alias(
            "rank_arith"
        ),
        F.rank().over(Window.orderBy(F.desc("geom"))).cast("long").alias(
            "rank_geom"
        ),
    ).orderBy("nation")
