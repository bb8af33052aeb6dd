"""Eighty-third oracle-registry module: the Arrow-optimized scalar
Python UDF surface and group data valuation.

  * arrow_scalar_udf_orders — Spark 4's Arrow-optimized scalar
    Python UDF (``F.udf(..., useArrow=True)``): per-row Python, but
    batches cross the JVM↔Python boundary as Arrow instead of
    pickled rows.  This is the LAST PySpark Python-execution API
    not yet pinned by an oracle (scalar/grouped-agg pandas UDF,
    mapInPandas, mapInArrow, applyInPandas(+state), cogrouped,
    applyInArrow, UDTF all are) — covered HERE to complete the
    surface, with the usual caveat that per-row Python is the slow
    path: everything hot in this engine stays in codegen or Arrow
    batch islands.  The UDF computes digit-reversal and digit-sum of
    the order key — integer/string exact, so the DuckDB twin
    (reverse + list arithmetic) has no float in the compare.

  * logo_influence_docs — leave-one-group-out data valuation: for
    each language cohort, the corpus mean n_chars WITHOUT that
    cohort vs with it — influence = mean_all − mean_without, the
    group-Shapley first-order readout behind "which data slice is
    dragging the metric".  One aggregate pass: all leave-one-out
    means derive algebraically from (total_sum, total_n, group_sum,
    group_n); exact integer sums divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ARROW_UDF_SQL = """
    SELECT o_orderkey,
           reverse(CAST(o_orderkey AS VARCHAR)) AS rev_key,
           CAST(list_sum(list_transform(string_split(CAST(o_orderkey AS VARCHAR), ''),
                x -> CAST(x AS BIGINT))) AS BIGINT) AS digit_sum
    FROM orders WHERE o_orderkey < 500
"""


@register("arrow_scalar_udf_orders", _ARROW_UDF_SQL)
def arrow_scalar_udf_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)

    @F.udf(returnType="string", useArrow=True)
    def rev_key(k: int) -> str:
        return str(k)[::-1]

    @F.udf(returnType="long", useArrow=True)
    def digit_sum(k: int) -> int:
        return sum(int(c) for c in str(k))

    return o.select(
        "o_orderkey",
        rev_key(F.col("o_orderkey")).alias("rev_key"),
        digit_sum(F.col("o_orderkey")).alias("digit_sum"),
    )


_LOGO_SQL = """
    WITH per_group AS (
      SELECT lang, COUNT(*) AS n_g, SUM(n_chars) AS s_g
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT SUM(n_g) AS n_all, SUM(s_g) AS s_all FROM per_group
    )
    SELECT g.lang, g.n_g,
           ROUND(t.s_all * 1.0 / t.n_all, 6) AS mean_all,
           ROUND((t.s_all - g.s_g) * 1.0 / (t.n_all - g.n_g), 6) AS mean_without,
           ROUND(t.s_all * 1.0 / t.n_all
                 - (t.s_all - g.s_g) * 1.0 / (t.n_all - g.n_g), 6) AS influence
    FROM per_group g, tot t
"""


@register("logo_influence_docs", _LOGO_SQL)
def logo_influence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per_group = d.groupBy("lang").agg(
        F.count("*").alias("n_g"), F.sum("n_chars").alias("s_g")
    )
    tot = per_group.agg(
        F.sum("n_g").alias("n_all"), F.sum("s_g").alias("s_all")
    )
    mean_all = F.col("s_all") * 1.0 / F.col("n_all")
    mean_wo = (F.col("s_all") - F.col("s_g")) * 1.0 / (F.col("n_all") - F.col("n_g"))
    return per_group.crossJoin(tot).select(
        "lang",
        "n_g",
        F.round(mean_all, 6).alias("mean_all"),
        F.round(mean_wo, 6).alias("mean_without"),
        F.round(mean_all - mean_wo, 6).alias("influence"),
    )
