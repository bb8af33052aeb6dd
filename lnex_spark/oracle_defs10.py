"""Tenth oracle-registry module: aggregate-surface stragglers —
the ANSI FILTER clause, discrete (type-7-free, explicit row-pick)
median, and the regr_* linear-regression aggregate family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FILTER_SQL = """
    SELECT o_orderpriority,
           count(*) AS n,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
           round(coalesce(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000), 0), 2) AS hi_rev
    FROM orders GROUP BY o_orderpriority
"""


# --- ANSI FILTER clause on aggregates -----------------------------------
@register("filter_clause_orders", _FILTER_SQL)
def filter_clause_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_SQL)


# --- discrete median: explicit ceil(n/2) row pick -----------------------
@register(
    "percentile_disc_prices",
    """
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag, round(l_extendedprice, 2) AS median_disc
    FROM r WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    """,
)
def percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete median as an explicit row pick (rank = ceil(n/2) under
    a fully-specified ordering) — identical semantics by construction
    in any engine, unlike quantile-type-dependent builtins."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return r.filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")).select(
        "l_returnflag", F.round("l_extendedprice", 2).alias("median_disc")
    )


# --- linear-regression aggregates ---------------------------------------
@register(
    "regr_price_qty",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )
