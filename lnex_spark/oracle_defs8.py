"""Eighth oracle-registry module: Spark-4 SQL-surface coverage that
needed runtime probing before claiming — recursive CTEs (new in
Spark 4), GROUP BY ALL / ORDER BY ALL resolution, exact DECIMAL
aggregation (vs the double-valued fact columns), and case-insensitive
LIKE.  The recursive-CTE op is the notable one: the same WITH
RECURSIVE text runs on both engines over an implicit parent tree
(node → floor(node/2)) derived from the customer table, and the
ancestor-pair fixpoints must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT c_custkey AS src, CAST(floor(c_custkey / 2) AS BIGINT) AS dst
      FROM customer WHERE c_custkey BETWEEN 1 AND 255
    ),
    walk(start, node) AS (
      SELECT src, src FROM edges WHERE src >= 200
      UNION ALL
      SELECT w.start, e.dst FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT start, node FROM walk
"""


# --- recursive CTE: ancestor closure over an implicit parent tree -------
@register("recursive_cte_ancestors", _RECURSIVE_SQL)
def recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_SQL)


# --- GROUP BY ALL / ORDER BY ALL ----------------------------------------
_GBA_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS revenue, count(*) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register("groupby_all_orders", _GBA_SQL)
def groupby_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GBA_SQL)


# --- exact DECIMAL aggregation ------------------------------------------
@register(
    "decimal_money_agg",
    """
    SELECT l_returnflag,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,4))) AS discounted,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def decimal_money_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math on exact decimals: double→decimal(18,2) casts round
    half-up identically in both engines, and decimal sums are exact —
    no float-rounding epsilon in the oracle compare at any sf."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).alias("gross"),
        F.sum(price * disc).alias("discounted"),
        F.count("*").alias("n"),
    )


# --- case-insensitive LIKE ----------------------------------------------
@register(
    "ilike_parts",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name ILIKE '%WIDGET%' OR p_name ILIKE 'Small %'
    """,
)
def ilike_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").ilike("%WIDGET%") | F.col("p_name").ilike("Small %")
    ).select("p_partkey", "p_name")
