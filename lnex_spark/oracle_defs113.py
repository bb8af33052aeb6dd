"""Hundred-thirteenth oracle-registry module: long-range dependence
and index numbers.

  * hurst_events — a two-scale rescaled-range (R/S) estimate of the
    Hurst exponent of the daily value series: the 30-day timeline is
    chunked into 5-day and 10-day blocks, each block's R/S =
    (max − min of the within-block cumulative deviation) / block
    std, and H = log(RS₁₀/RS₅)/log(2).  H ≈ 0.5 means the series
    forgets (i.i.d.-like); H → 1 means shocks persist — the
    long-memory diagnostic that says whether daily aggregates can be
    treated as exchangeable (every per-day resample here assumes
    they can).  Block cumulatives are per-block windows; no global
    sequential state.

  * price_index_lineitem — Laspeyres and Paasche price indices per
    brand between ship-years 1995 (base) and 1996: items are
    (brand, p_type) baskets with unit prices extendedprice/quantity
    per year; Laspeyres weights item quantities at base year,
    Paasche at current, Fisher = sqrt of their product — the
    aggregation across items is what makes the two indices genuinely
    differ.  The index-number machinery of any
    "price/cost drift by segment" report; exact quantity sums,
    one aggregation + one self-join on brand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rs_cte(tag: str, block_days: int) -> str:
    return f"""
    blk_{tag} AS (
      SELECT (dnum // {block_days}) AS blk, dnum, y FROM daily
    ),
    stats_{tag} AS (
      SELECT blk, AVG(y) AS mu,
             sqrt(AVG(y * y) - AVG(y) * AVG(y)) AS sd,
             COUNT(*) AS n
      FROM blk_{tag} GROUP BY blk HAVING COUNT(*) = {block_days}
    ),
    cum_{tag} AS (
      SELECT b.blk,
             SUM(b.y - s.mu) OVER (PARTITION BY b.blk ORDER BY b.dnum
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
      FROM blk_{tag} b JOIN stats_{tag} s ON b.blk = s.blk
    ),
    rs_{tag} AS (
      SELECT c.blk, (MAX(c.cd) - MIN(c.cd)) / MAX(s.sd) AS rs
      FROM cum_{tag} c JOIN stats_{tag} s ON c.blk = s.blk
      WHERE s.sd > 0 GROUP BY c.blk
    ),
    mean_rs_{tag} AS (SELECT AVG(rs) AS m FROM rs_{tag})"""


_HURST_SQL = f"""
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dnum,
             AVG(value) AS y
      FROM events GROUP BY 1
    ),
    {_rs_cte("s5", 5)},
    {_rs_cte("s10", 10)}
    SELECT ROUND(a.m, 6) AS mean_rs_5,
           ROUND(b.m, 6) AS mean_rs_10,
           ROUND(ln(b.m / a.m) / ln(2.0), 6) AS hurst
    FROM mean_rs_s5 a, mean_rs_s10 b
"""


@register("hurst_events", _HURST_SQL)
def hurst_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("long")
        .alias("dnum")
    ).agg(F.avg("value").alias("y"))

    def mean_rs(block_days: int) -> DataFrame:
        blk = daily.select((F.floor(F.col("dnum") / block_days)).alias("blk"), "dnum", "y")
        stats = (
            blk.groupBy("blk")
            .agg(
                F.avg("y").alias("mu"),
                F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias(
                    "sd"
                ),
                F.count("*").alias("n"),
            )
            .filter(F.col("n") == block_days)
        )
        wcum = (
            Window.partitionBy("blk")
            .orderBy("dnum")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = blk.join(stats, "blk").select(
            "blk", "sd", F.sum(F.col("y") - F.col("mu")).over(wcum).alias("cd")
        )
        rs = (
            cum.filter(F.col("sd") > 0)
            .groupBy("blk")
            .agg(((F.max("cd") - F.min("cd")) / F.max("sd")).alias("rs"))
        )
        return rs.agg(F.avg("rs").alias("m"))

    a = mean_rs(5).select(F.col("m").alias("m5"))
    b = mean_rs(10).select(F.col("m").alias("m10"))
    return a.crossJoin(b).select(
        F.round("m5", 6).alias("mean_rs_5"),
        F.round("m10", 6).alias("mean_rs_10"),
        F.round(F.log(F.col("m10") / F.col("m5")) / F.log(F.lit(2.0)), 6).alias(
            "hurst"
        ),
    )


_PI_SQL = """
    WITH yearly AS (
      SELECT p.p_brand AS brand, p.p_type AS item,
             CAST(date_part('year', l.l_shipdate) AS INTEGER) AS yr,
             SUM(l.l_extendedprice) AS val, SUM(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE date_part('year', l.l_shipdate) IN (1995, 1996)
      GROUP BY 1, 2, 3
    ),
    paired AS (
      SELECT b.brand, b.item,
             b.val / b.qty AS p0, b.qty AS q0,
             c.val / c.qty AS p1, c.qty AS q1
      FROM (SELECT * FROM yearly WHERE yr = 1995) b
      JOIN (SELECT * FROM yearly WHERE yr = 1996) c
        ON b.brand = c.brand AND b.item = c.item
    ),
    agg AS (
      SELECT brand, COUNT(*) AS n_items,
             SUM(p1 * q0) / SUM(p0 * q0) AS laspeyres,
             SUM(p1 * q1) / SUM(p0 * q1) AS paasche
      FROM paired GROUP BY brand
    )
    SELECT brand, CAST(n_items AS BIGINT) AS n_items,
           ROUND(laspeyres, 6) AS laspeyres,
           ROUND(paasche, 6) AS paasche,
           ROUND(sqrt(laspeyres * paasche), 6) AS fisher
    FROM agg
"""


@register("price_index_lineitem", _PI_SQL)
def price_index_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    yearly = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("item"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum("l_extendedprice").alias("val"), F.sum("l_quantity").alias("qty")
        )
    )
    b = yearly.filter(F.col("yr") == 1995).select(
        "brand",
        "item",
        (F.col("val") / F.col("qty")).alias("p0"),
        F.col("qty").alias("q0"),
    )
    c = yearly.filter(F.col("yr") == 1996).select(
        F.col("brand").alias("brand2"),
        F.col("item").alias("item2"),
        (F.col("val") / F.col("qty")).alias("p1"),
        F.col("qty").alias("q1"),
    )
    paired = b.join(c, (b["brand"] == c["brand2"]) & (b["item"] == c["item2"]))
    agg = paired.groupBy("brand").agg(
        F.count("*").alias("n_items"),
        (
            F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paasche"),
    )
    return agg.select(
        "brand",
        F.col("n_items").cast("long").alias("n_items"),
        F.round("laspeyres", 6).alias("laspeyres"),
        F.round("paasche", 6).alias("paasche"),
        F.round(F.sqrt(F.col("laspeyres") * F.col("paasche")), 6).alias("fisher"),
    )
