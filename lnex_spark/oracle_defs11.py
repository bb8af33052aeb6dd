"""Eleventh oracle-registry module: generator/scalar stragglers —
outer explode (empty array ⇒ one NULL row, the generator form that
keeps left-side rows), a timestamp format→parse round trip via the
try_* family, greatest/least/nullif scalar coverage, and UNION ALL
BY NAME with mismatched column sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- explode_outer: empty arrays keep their row -------------------------
@register(
    "explode_outer_longtoks",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> len(t) >= 8) AS long_toks
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, unnest(CASE WHEN len(long_toks) = 0 THEN [NULL] ELSE long_toks END) AS tok
    FROM toks
    """,
)
def explode_outer_longtoks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    long_toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda t: F.length(t) >= 8
    )
    return d.select("doc_id", long_toks.alias("lt")).select(
        "doc_id", F.explode_outer("lt").alias("tok")
    )


# --- format → try-parse timestamp round trip -----------------------------
@register(
    "try_timestamp_events",
    """
    SELECT event_id,
           try_strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed,
           try_strptime('not a timestamp', '%Y-%m-%d %H:%M:%S') IS NULL AS bad_is_null
    FROM events WHERE event_id < 2000
    """,
)
def try_timestamp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.try_to_timestamp(F.date_format("ts", fmt), F.lit(fmt)).alias("parsed"),
        F.try_to_timestamp(F.lit("not a timestamp"), F.lit(fmt)).isNull().alias("bad_is_null"),
    )


# --- greatest / least / nullif scalar coverage ---------------------------
@register(
    "scalar_funcs_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           round(greatest(l_quantity, l_discount * 100, l_tax * 100), 4) AS hi,
           -- 5 decimals: a 2-decimal price / 1000 has exactly 5 decimal
           -- digits, so rounding is the identity and never sits on the
           -- .5 boundary where Spark (decimal HALF_UP) and DuckDB
           -- (binary double) disagree
           round(least(l_quantity, l_extendedprice / 1000), 5) AS lo,
           nullif(l_linenumber, 1) AS ln_or_null,
           coalesce(nullif(l_returnflag, 'N'), 'neutral') AS flag
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def scalar_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.greatest("l_quantity", F.col("l_discount") * 100, F.col("l_tax") * 100), 4
        ).alias("hi"),
        F.round(F.least("l_quantity", F.col("l_extendedprice") / 1000), 5).alias("lo"),
        F.nullif("l_linenumber", F.lit(1)).alias("ln_or_null"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("neutral")).alias("flag"),
    )


# --- UNION ALL BY NAME with mismatched column sets ----------------------
@register(
    "union_byname_mixed",
    """
    SELECT * FROM (
      SELECT o_orderkey AS k, o_totalprice AS price, NULL AS seg
      FROM orders WHERE o_orderkey < 300
      UNION ALL BY NAME
      SELECT c_custkey AS k, c_mktsegment AS seg, NULL AS price
      FROM customer WHERE c_custkey < 100
    )
    """,
)
def union_byname_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 300)
        .select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))
    )
    return o.unionByName(c, allowMissingColumns=True)
