"""Registered (Spark, DuckDB-SQL) operator pairs — see oracles.py.

Each op re-expresses one SURVEY.md §2 operator over the driver's
testdata tables. Spark side uses built-in functions only (the point of
the oracle is the relational semantics, not the UDF islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- G2 name_normalize: lowercase/strip/collapse over part names -------
@register(
    "g2_name_normalize",
    """
    SELECT p_partkey,
           trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
    FROM part
    """,
)
def g2_name_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("p_name")), r"[^a-z0-9 ]", " "), r" +", " ")
    )
    return p.select("p_partkey", norm.alias("norm"))
