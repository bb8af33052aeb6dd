"""Fifteenth oracle-registry module: the remaining classic TPC-H join
shapes expressible on the driver's star schema (no partsupp table, no
commit/receipt dates — shapes are preserved, predicates adapted to the
columns that exist), plus window RANGE frames and distinct aggregates.

  * q7_volume_shipping   — TPC-H Q7: bilateral nation-pair volume by
    ship year (6-table join, two roles for ``nation``).
  * q14_promo_revenue    — TPC-H Q14: conditional-revenue share
    (CASE-gated sum over a join) per ship year.
  * q16_supplier_cnt     — TPC-H Q16: count(DISTINCT supplier) per
    part attribute group with a NOT-IN (anti-join) supplier exclusion;
    lineitem stands in for the absent partsupp.
  * q19_disjunctive_rev  — TPC-H Q19: OR-of-conjunctions predicate
    (brand x size x quantity bands) that defeats naive pushdown;
    Catalyst still prunes columns and pushes the join key.
  * q21_last_shipper     — TPC-H Q21 shape: doubly-correlated
    EXISTS + NOT EXISTS (another supplier on the order exists, but
    none shipped later) — the "who shipped last on multi-supplier
    finished orders" report. Spark side uses left-semi + left-anti
    joins with mixed equi/theta conditions.
  * q22_idle_customers   — TPC-H Q22 shape: uncorrelated scalar
    subquery threshold (above-average balance) + anti-join against
    orders (never ordered), grouped by a derived customer code.
  * range_frame_orders   — window RANGE frame keyed on days (30-day
    trailing revenue per order) — value-based frames vs the ROWS
    frames covered by moving_avg_orders.
  * distinct_agg_orders  — count(DISTINCT), sum(DISTINCT), count_if
    in one grouped aggregate (Spark plans a single expand + two-phase
    agg; worth pinning semantics vs the oracle).

Reference parity note: LNEx itself has no relational layer [SURVEY.md
§0]; these ops evidence the §2B survey categories (joins, correlated
subqueries, window frames, distinct aggregation) on the engine we
graft LNEx's semantics onto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- TPC-H Q7: volume shipping between nation pairs ------------------------
@register(
    "q7_volume_shipping",
    """
    -- money sums go through DECIMAL(18,4): the per-row volume has exactly
    -- 4 true decimals so the double->decimal cast lands ON grid (never at
    -- a tie), the decimal sum is exact and order-independent (a raw
    -- double sum differs between engines by addition order — caught at
    -- full-precision canonicalization), and round() in decimal space is
    -- exact HALF_UP in both engines before the final cast to double.
    SELECT supp_nation, cust_nation, l_year,
           cast(round(sum(cast(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name < n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("s_nk"))
        .join(n2, c.c_nationkey == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))


# --- TPC-H Q14: promo revenue share per ship year --------------------------
@register(
    "q14_promo_revenue",
    """
    SELECT year(l.l_shipdate) AS l_year,
           cast(round(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN cast(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                          ELSE 0 END), 2) AS DOUBLE) AS promo_rev,
           cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_rev,
           round(100.0 * cast(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN cast(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                              ELSE 0 END) AS DOUBLE)
                 / cast(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY year(l.l_shipdate)
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # DECIMAL(18,4) money sums (engine-identical; see q7) — the ratio is
    # then a double division of two exact decimals, identical both sides
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(promo), 2).cast("double").alias("promo_rev"),
            F.round(F.sum(vol), 2).cast("double").alias("total_rev"),
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double"), 4
            ).alias("promo_pct"),
        )
    )


# --- TPC-H Q16: supplier count per part group, NOT IN exclusion ------------
@register(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#15'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.where(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(pf), l.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- TPC-H Q19: disjunction of conjunctive bands ---------------------------
@register(
    "q19_disjunctive_rev",
    """
    SELECT p.p_brand,
           cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
)
def q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.where(band).groupBy("p_brand").agg(
        F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue")
    )


# --- TPC-H Q21 shape: last shipper on multi-supplier finished orders -------
@register(
    "q21_last_shipper",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = _t(spark, sf_dir, "supplier")
    l1 = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
    l2 = l.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"), F.col("l_shipdate").alias("sd2")
    )
    # EXISTS: some other supplier on the same order
    has_other = l1.join(
        l2, (l1.l_orderkey == F.col("ok2")) & (l1.l_suppkey != F.col("sk2")), "left_semi"
    )
    # NOT EXISTS: no other supplier shipped strictly later
    last = has_other.join(
        l2,
        (has_other.l_orderkey == F.col("ok2"))
        & (has_other.l_suppkey != F.col("sk2"))
        & (F.col("sd2") > has_other.l_shipdate),
        "left_anti",
    )
    return (
        last.join(F.broadcast(s), last.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --- TPC-H Q22 shape: above-average-balance customers with no orders -------
@register(
    "q22_idle_customers",
    """
    SELECT c.c_custkey % 7 AS code,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_custkey % 7
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape; 'idle' = no URGENT order (plain no-orders is empty on
    this data — every customer ordered), keeping the anti-join non-trivial
    at every sf."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # Uncorrelated scalar subquery: one tiny aggregate job, threshold
    # folded into the main plan as a literal (same as Catalyst's
    # subquery-as-scalar execution; avoids a cross join).
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    return (
        c.where(F.col("c_acctbal") > F.lit(avg_bal))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("code"))
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


# --- RANGE (value-based) window frame: 30-day trailing revenue -------------
@register(
    "range_frame_orders",
    """
    SELECT o_orderkey, o_orderpriority,
           count(*) OVER w AS n_trailing,
           round(sum(o_totalprice) OVER w, 2) AS rev_trailing
    FROM orders
    WINDOW w AS (
      PARTITION BY o_orderpriority
      ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def range_frame_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count("*").over(w).alias("n_trailing"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_trailing"),
    )


# --- distinct aggregates + count_if in one grouped agg ---------------------
@register(
    "distinct_agg_orders",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           sum(DISTINCT cast(floor(o_totalprice / 10000) AS BIGINT)) AS sum_buckets,
           count(*) FILTER (WHERE o_totalprice > 150000) AS n_big
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 10000).cast("long")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_cust"),
        F.sum_distinct(bucket).alias("sum_buckets"),
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
    )
