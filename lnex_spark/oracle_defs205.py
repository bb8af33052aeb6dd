"""Two-hundred-fifth oracle-registry module: finance-operations
audits over the orders ledger — the receivables snapshot and the
double-billing screen every ERP closes the month with.

  * ar_aging_orders — accounts-receivable aging at the snapshot
    date max(o_orderdate): open orders (status 'O') bucketed by age
    into 0-90 / 91-180 / 181-365 / 365+ days, per bucket the order
    count, outstanding value, share of total AR, and per-bucket
    share of each priority class being urgent (1-2) — the roll-rate
    input to any bad-debt reserve.  One filter + one groupBy over a
    value-anchored bucket edge, scale-free.

  * dup_invoice_orders — duplicate-billing screen: pairs of orders
    with the SAME customer and SAME total price (exact, to the
    cent) placed within 30 days of each other — the classic
    double-submission signature.  Self-join on the (custkey, price)
    composite key only (no quadratic blowup: the join key IS the
    blocking key, record-linkage style), reporting pair count,
    involved orders, exposure value, and the worst customer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_AGING_SQL = """
    WITH snap AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS today FROM orders
    ),
    open_ar AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       (SELECT today FROM snap)) AS age
      FROM orders WHERE o_orderstatus = 'O'
    ),
    bucketed AS (
      SELECT CASE WHEN age <= 90 THEN '0-090'
                  WHEN age <= 180 THEN '091-180'
                  WHEN age <= 365 THEN '181-365'
                  ELSE '365+' END AS bucket,
             o_totalprice,
             CASE WHEN SUBSTR(o_orderpriority, 1, 1) IN ('1', '2')
                  THEN 1 ELSE 0 END AS urgent
      FROM open_ar
    ),
    tot AS (SELECT SUM(o_totalprice) AS t FROM bucketed)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS outstanding,
           ROUND(SUM(o_totalprice) / (SELECT t FROM tot), 6) AS ar_share,
           ROUND(AVG(CAST(urgent AS DOUBLE)), 6) AS urgent_share
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""


@register("ar_aging_orders", _AGING_SQL)
def ar_aging_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    snap = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("today"))
    open_ar = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            "o_totalprice",
            "o_orderpriority",
            F.datediff(
                F.col("today"), F.col("o_orderdate").cast("date")
            ).alias("age"),
        )
    )
    bucketed = open_ar.select(
        F.when(F.col("age") <= 90, "0-090")
        .when(F.col("age") <= 180, "091-180")
        .when(F.col("age") <= 365, "181-365")
        .otherwise("365+")
        .alias("bucket"),
        "o_totalprice",
        F.when(
            F.substring("o_orderpriority", 1, 1).isin("1", "2"), 1
        )
        .otherwise(0)
        .alias("urgent"),
    )
    tot = bucketed.agg(F.sum("o_totalprice").alias("t"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("outstanding"),
            F.round(F.sum("o_totalprice") / F.max("t"), 6).alias("ar_share"),
            F.round(F.avg(F.col("urgent").cast("double")), 6).alias(
                "urgent_share"
            ),
        )
        .orderBy("bucket")
    )


_DUP_SQL = """
    WITH pairs AS (
      SELECT a.o_custkey, a.o_totalprice,
             a.o_orderkey AS k1, b.o_orderkey AS k2,
             ABS(date_diff('day', CAST(a.o_orderdate AS DATE),
                           CAST(b.o_orderdate AS DATE))) AS gap_days
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND a.o_totalprice = b.o_totalprice
       AND a.o_orderkey < b.o_orderkey
      WHERE ABS(date_diff('day', CAST(a.o_orderdate AS DATE),
                          CAST(b.o_orderdate AS DATE))) <= 30
    ),
    worst AS (
      SELECT o_custkey, COUNT(*) AS c FROM pairs GROUP BY o_custkey
      ORDER BY c DESC, o_custkey LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT k1) + COUNT(DISTINCT k2) AS BIGINT)
             AS orders_involved,
           ROUND(SUM(o_totalprice), 2) AS exposure,
           ROUND(AVG(CAST(gap_days AS DOUBLE)), 4) AS mean_gap_days,
           (SELECT o_custkey FROM worst) AS worst_custkey,
           (SELECT c FROM worst) AS worst_pairs
    FROM pairs
"""


@register("dup_invoice_orders", _DUP_SQL)
def dup_invoice_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        "o_custkey",
        "o_totalprice",
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").cast("date").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck2"),
        F.col("o_totalprice").alias("tp2"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").cast("date").alias("d2"),
    )
    pairs = (
        a.join(
            b,
            (F.col("o_custkey") == F.col("ck2"))
            & (F.col("o_totalprice") == F.col("tp2"))
            & (F.col("k1") < F.col("k2")),
        )
        .withColumn("gap_days", F.abs(F.datediff("d1", "d2")))
        .where(F.col("gap_days") <= 30)
        .select("o_custkey", "o_totalprice", "k1", "k2", "gap_days")
    )
    worst = (
        pairs.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "o_custkey")
        .limit(1)
        .select(
            F.col("o_custkey").alias("worst_custkey"),
            F.col("c").alias("worst_pairs"),
        )
    )
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        (F.countDistinct("k1") + F.countDistinct("k2"))
        .cast("long")
        .alias("orders_involved"),
        F.round(F.sum("o_totalprice"), 2).alias("exposure"),
        F.round(F.avg(F.col("gap_days").cast("double")), 4).alias(
            "mean_gap_days"
        ),
    )
    return agg.join(F.broadcast(worst), F.lit(True), "left")
