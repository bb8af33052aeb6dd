"""Forty-sixth oracle-registry module: scalable exact quantile
selection.

  * scalable_median_price — the exact discrete median of
    l_extendedprice via TWO-PASS BUCKETED RANK SELECTION
    (operators/quantiles.bucketed_exact_quantile): histogram pass →
    locate the rank-containing bucket → bounded in-bucket pick.  The
    100 TB answer to the "global ORDER BY window, bounded input"
    caveat carried by the windowed quantile ops — no global sort
    anywhere, and the DuckDB twin IS the global ordered pick, so the
    value-hash match proves the two-pass selection returns exactly
    the rank the sort would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SCALABLE_MEDIAN_SQL = """
    WITH ranked AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice) AS rn,
             count(*) OVER () AS n
      FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(CAST(ceil(n / 2.0) AS BIGINT) AS BIGINT) AS k,
           round(v, 6) AS median
    FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
"""


@register("scalable_median_price", _SCALABLE_MEDIAN_SQL)
def scalable_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lnex_spark.operators.quantiles import bucketed_exact_quantile

    li = _t(spark, sf_dir, "lineitem")
    n, k, val = bucketed_exact_quantile(li, "l_extendedprice", 0.5, bucket_width=100.0)
    return spark.createDataFrame([(n, k, round(val, 6))], "n long, k long, median double").select(
        "n", "k", F.round("median", 6).alias("median")
    )
