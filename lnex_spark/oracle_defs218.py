"""Two-hundred-eighteenth oracle-registry module: regional-economics
decompositions of the order ledger — where growth comes from and
where segments concentrate.

  * shift_share_orders — classic three-component shift-share of each
    customer nation's order-count growth between the first and
    second half of the date range: national share (what growing with
    the total would give), industry mix (the extra from the nation's
    priority-class composition — classes that boomed nationally),
    and regional shift (the residual competitiveness term).  The
    three EXACTLY sum to actual growth (identity column) — the
    attribution every "region X is underperforming" claim needs
    before it names a cause.

  * location_quotient_customers — location quotient of each
    (nation, market segment): LQ = segment's share of the nation's
    customers / segment's share everywhere.  LQ > 1.25 = a
    specialization cluster, the within-country dual of balassa_rca's
    export-side index; emitted with supports so small-cell LQs can
    be discounted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SS_SQL = """
    WITH mid AS (
      SELECT MIN(epoch_us(o_orderdate))
             + (MAX(epoch_us(o_orderdate)) - MIN(epoch_us(o_orderdate))) / 2
               AS m
      FROM orders
    ),
    base AS (
      SELECT c.c_nationkey AS nation, o.o_orderpriority AS ind,
             CASE WHEN epoch_us(o.o_orderdate) < (SELECT m FROM mid)
                  THEN 0 ELSE 1 END AS per
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cell AS (
      SELECT nation, ind,
             SUM(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS e0,
             SUM(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS e1
      FROM base GROUP BY nation, ind
    ),
    nat AS (
      SELECT ind, SUM(e0) AS n0, SUM(e1) AS n1 FROM cell GROUP BY ind
    ),
    tot AS (
      SELECT SUM(e0) AS t0, SUM(e1) AS t1 FROM cell
    ),
    comp AS (
      SELECT c.nation,
             SUM(c.e1 - c.e0) AS actual,
             SUM(c.e0 * ((SELECT CAST(t1 AS DOUBLE) / t0 FROM tot) - 1))
               AS national,
             SUM(c.e0 * (CAST(n.n1 AS DOUBLE) / n.n0
                         - (SELECT CAST(t1 AS DOUBLE) / t0 FROM tot)))
               AS mix,
             SUM(c.e1 - c.e0 * CAST(n.n1 AS DOUBLE) / n.n0) AS shift
      FROM cell c JOIN nat n ON n.ind = c.ind
      GROUP BY c.nation
    )
    SELECT nation,
           CAST(actual AS BIGINT) AS actual_growth,
           ROUND(national, 4) AS national_component,
           ROUND(mix, 4) AS industry_mix,
           ROUND(shift, 4) AS regional_shift,
           ROUND(ABS(actual - national - mix - shift), 6) AS identity_gap
    FROM comp
    ORDER BY nation
"""


@register("shift_share_orders", _SS_SQL)
def shift_share_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    mid = o.agg(
        (F.min(us) + (F.max(us) - F.min(us)) / 2).alias("m")
    )
    base = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .crossJoin(F.broadcast(mid))
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderpriority").alias("ind"),
            F.when(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                < F.col("m"),
                0,
            )
            .otherwise(1)
            .alias("per"),
        )
    )
    cell = base.groupBy("nation", "ind").agg(
        F.sum(F.when(F.col("per") == 0, 1).otherwise(0)).alias("e0"),
        F.sum(F.when(F.col("per") == 1, 1).otherwise(0)).alias("e1"),
    )
    nat = cell.groupBy("ind").agg(
        F.sum("e0").alias("n0"), F.sum("e1").alias("n1")
    )
    tot = cell.agg(F.sum("e0").alias("t0"), F.sum("e1").alias("t1"))
    g = F.col("t1").cast("double") / F.col("t0")
    gi = F.col("n1").cast("double") / F.col("n0")
    comp = (
        cell.join(F.broadcast(nat), "ind")
        .crossJoin(F.broadcast(tot))
        .groupBy("nation")
        .agg(
            F.sum(F.col("e1") - F.col("e0")).alias("actual"),
            F.sum(F.col("e0") * (g - 1)).alias("national"),
            F.sum(F.col("e0") * (gi - g)).alias("mix"),
            F.sum(F.col("e1") - F.col("e0") * gi).alias("shift"),
        )
    )
    return comp.select(
        "nation",
        F.col("actual").cast("long").alias("actual_growth"),
        F.round("national", 4).alias("national_component"),
        F.round("mix", 4).alias("industry_mix"),
        F.round("shift", 4).alias("regional_shift"),
        F.round(
            F.abs(
                F.col("actual")
                - F.col("national")
                - F.col("mix")
                - F.col("shift")
            ),
            6,
        ).alias("identity_gap"),
    ).orderBy("nation")


_LQ_SQL = """
    WITH cell AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    ),
    nat AS (SELECT nation, SUM(n) AS nn FROM cell GROUP BY nation),
    seg AS (SELECT seg, SUM(n) AS ns FROM cell GROUP BY seg),
    tot AS (SELECT SUM(n) AS t FROM cell)
    SELECT c.nation, c.seg AS segment,
           CAST(c.n AS BIGINT) AS n_customers,
           ROUND((CAST(c.n AS DOUBLE) / na.nn)
                 / (CAST(s.ns AS DOUBLE) / (SELECT t FROM tot)), 6) AS lq,
           CASE WHEN (CAST(c.n AS DOUBLE) / na.nn)
                     / (CAST(s.ns AS DOUBLE) / (SELECT t FROM tot)) > 1.25
                THEN 1 ELSE 0 END AS cluster_flag
    FROM cell c
    JOIN nat na ON na.nation = c.nation
    JOIN seg s ON s.seg = c.seg
    ORDER BY c.nation, segment
"""


@register("location_quotient_customers", _LQ_SQL)
def location_quotient_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cell = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").alias("n"))
    nat = cell.groupBy("nation").agg(F.sum("n").alias("nn"))
    seg = cell.groupBy("seg").agg(F.sum("n").alias("ns"))
    tot = cell.agg(F.sum("n").alias("t"))
    lq = (F.col("n").cast("double") / F.col("nn")) / (
        F.col("ns").cast("double") / F.col("t")
    )
    return (
        cell.join(F.broadcast(nat), "nation")
        .join(F.broadcast(seg), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.col("seg").alias("segment"),
            F.col("n").cast("long").alias("n_customers"),
            F.round(lq, 6).alias("lq"),
            F.when(lq > 1.25, 1).otherwise(0).alias("cluster_flag"),
        )
        .orderBy("nation", "segment")
    )
