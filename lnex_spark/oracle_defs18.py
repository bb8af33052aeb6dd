"""Eighteenth oracle-registry module: the ten remaining classic TPC-H
query shapes (Q2, Q6, Q8-Q13, Q15, Q20), completing all-22 coverage
of the benchmark's query classes on the driver's star schema (no
partsupp table, no
commit/receipt/ship-mode columns — ``lineitem`` grouped by
(partkey, suppkey) stands in for partsupp, and predicates are adapted
to the columns that exist; the JOIN/SUBQUERY/AGG shape of each query
is preserved exactly).

  * q2_min_cost_supplier  — Q2: min-cost supplier per part within a
    region. The correlated-min is expressed as a per-part window MIN
    (the Spark-idiomatic decorrelation Catalyst itself would apply);
    min() is a selection, not an accumulation, so the double equality
    `ucost = best` is engine-stable.
  * q6_forecast_revenue   — Q6: the pure scan-filter-aggregate; every
    predicate pushdown-eligible, no join.
  * q8_market_share       — Q8: one nation's share of a region's
    yearly import volume (8-table join, CASE-gated ratio of sums).
  * q9_product_profit     — Q9: profit by supplier nation x order
    year (retailprice-based cost proxy for the absent ps_supplycost).
  * q10_returned_items    — Q10: revenue lost to returns per customer
    in a date window (returnflag filter + 4-table join).
  * q11_important_parts   — Q11: parts whose inventory value exceeds
    a multiple of the mean — uncorrelated scalar-subquery threshold
    over the SAME aggregate CTE. DECIMAL(18,4) sums on both engines
    make the totals exact; the threshold (3x mean, scale-free across
    SFs unlike Q11's fixed fraction) is then a single deterministic
    double expression, not float-ordering-lucky.
  * q12_late_shipments    — Q12: priority mix of late shipments
    (interval date arithmetic join predicate; linestatus stands in
    for shipmode).
  * q13_order_distribution— Q13: customers-per-order-count histogram
    (LEFT OUTER join with an ON-clause filter + double aggregation).
  * q15_top_supplier      — Q15: supplier(s) with max revenue in a
    window — scalar-subquery max against a shared CTE; DECIMAL sums
    make the `= max` equality exact and tie-handling identical.
  * q20_potential_promo   — Q20: suppliers who shipped > threshold
    of promo-named parts (nested IN chain → left-semi joins).

At 100 TB every one of these is the canonical shuffle-join/agg plan:
dims broadcast (nation/region/supplier always; part when filtered),
fact-side sums are partial+final hash aggs, the scalar-subquery
thresholds are 1-row broadcasts, and AQE handles the skewed keys.

Reference parity note: LNEx itself has no relational layer [SURVEY.md
§0]; these ops evidence the §2B survey categories on the engine the
LNEx semantics are grafted onto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _vol():
    # built lazily: creating Columns at import time requires an active session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q2: min-cost supplier per part in a region ----------------------------
@register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             min(l_extendedprice / l_quantity) AS ucost
      FROM lineitem GROUP BY 1, 2
    ),
    esupp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    costs AS (
      SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, e.s_acctbal, sp.ucost,
             min(sp.ucost) OVER (PARTITION BY p.p_partkey) AS best
      FROM part p
      JOIN supply sp ON p.p_partkey = sp.pk
      JOIN esupp e ON sp.sk = e.s_suppkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 25
    )
    SELECT p_partkey, p_name, s_name, n_name,
           round(s_acctbal, 2) AS acctbal,
           -- floor form, not round(,6): price/qty with a power-of-two
           -- quantity lands EXACTLY on a 7th-decimal 5 (found at sf0.1:
           -- 266.9078125 -> Spark .907813, DuckDB .907812); identical
           -- IEEE ops on both engines resolve the tie identically
           floor(ucost * 1e6 + 0.5) / 1e6 AS ucost
    FROM costs WHERE ucost = best
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    supply = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ucost"))
    esupp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = F.broadcast(p.where((F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)))
    costs = (
        supply.join(parts, supply.pk == parts.p_partkey)
        .join(esupp, supply.sk == esupp.s_suppkey)
        .withColumn("best", F.min("ucost").over(Window.partitionBy("p_partkey")))
    )
    return costs.where(F.col("ucost") == F.col("best")).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        F.round("s_acctbal", 2).alias("acctbal"),
        # floor form — see the SQL comment
        (F.floor(F.col("ucost") * F.lit(1e6) + F.lit(0.5)) / 1e6).alias("ucost"),
    )


# --- Q6: forecast revenue change -------------------------------------------
@register(
    "q6_forecast_revenue",
    """
    SELECT cast(round(sum(cast(l_extendedprice * l_discount
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           cast(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-filter-aggregate — every predicate is
    pushdown-eligible (``PushedFilters`` on the parquet scan), no join,
    one partial+final agg; the canonical test that filters reach the
    scan instead of running post-scan."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


# --- Q8: national market share ---------------------------------------------
@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / cast(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             cast(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    eur = r.where(F.col("r_name") == "EUROPE").select("r_regionkey")
    econ = p.where(F.col("p_type") == "ECONOMY").select("p_partkey")
    joined = (
        l.join(F.broadcast(econ), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(eur), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            # DECIMAL(18,4) per-row volume → exact sums → the share is a
            # double division of two exact decimals, identical both sides
            _vol().cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return joined.groupBy("o_year").agg(
        F.round(F.sum(nat).cast("double") / F.sum("volume").cast("double"), 6).alias("mkt_share")
    )


# --- Q9: product-type profit by nation and year ----------------------------
@register(
    "q9_product_profit",
    """
    -- DECIMAL(18,4) sum + decimal-space round (see q7/q10): amount has
    -- exactly 4 true decimals (vol 4, 0.6*retailprice*qty 3), so the
    -- per-row cast lands on grid; the raw double sum diverged by a cent
    -- at sf0.001 (found by the full-precision sweep)
    SELECT nation, o_year,
           cast(round(sum(cast(amount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    bolts = p.where(F.col("p_name").like("%bolt%")).select("p_partkey", "p_retailprice")
    amount = _vol() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    joined = (
        l.join(F.broadcast(bolts), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
    )
    return joined.groupBy("nation", "o_year").agg(
        F.round(F.sum(F.col("amount").cast("decimal(18,4)")), 2).cast("double").alias("sum_profit")
    )


# --- Q10: returned-item revenue per customer -------------------------------
@register(
    "q10_returned_items",
    """
    -- DECIMAL(18,4) sum + decimal-space round: exact and engine-identical
    -- (see q7_volume_shipping's comment — raw double sums are
    -- order-dependent and diverge at cent boundaries)
    SELECT c.c_custkey, c.c_name,
           cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    window = (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    joined = (
        l.where(F.col("l_returnflag") == "R")
        .join(o.where(window), l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(_vol().cast("decimal(18,4)")), 2).cast("double").alias("revenue")
    ).select(
        "c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("acctbal"), "n_name"
    )


# --- Q11: important parts (value above a fraction of the total) ------------
@register(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l.l_partkey,
             sum(cast(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(cast(value AS DOUBLE), 2) AS value
    FROM val
    WHERE cast(value AS DOUBLE) >
          (SELECT 3.0 * cast(sum(value) AS DOUBLE) / count(*) FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nats = n.where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")).select("n_nationkey")
    val = (
        l.join(F.broadcast(s.join(F.broadcast(nats), s.s_nationkey == F.col("n_nationkey"))), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_vol().cast("decimal(18,4)")).alias("value"))
    )
    thresh = val.agg(
        (F.lit(3.0) * F.sum("value").cast("double") / F.count("*")).alias("thr")
    )
    return (
        val.join(F.broadcast(thresh))
        .where(F.col("value").cast("double") > F.col("thr"))
        .select("l_partkey", F.round(F.col("value").cast("double"), 2).alias("value"))
    )


# --- Q12: late-shipment priority mix ---------------------------------------
@register(
    "q12_late_shipments",
    """
    SELECT l.l_linestatus,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


# --- Q13: customer order-count distribution --------------------------------
@register(
    "q13_order_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15: top supplier(s) by windowed revenue ------------------------------
@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(cast(r.total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    window = (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp")
    )
    revenue = (
        l.where(window)
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol().cast("decimal(18,4)")).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"),
        )
    )


# --- Q20: suppliers with excess promo-part shipments -----------------------
@register(
    "q20_potential_promo",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    qual AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN red_parts rp ON sh.l_partkey = rp.p_partkey
      WHERE sh.qty > 50
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    window = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    shipped = (
        l.where(window)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    red = p.where(F.col("p_name").like("red%")).select("p_partkey")
    qual = (
        shipped.join(F.broadcast(red), shipped.l_partkey == F.col("p_partkey"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
    )
