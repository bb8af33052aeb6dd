"""Forty-seventh oracle-registry module: deterministic epoch
shuffling.

  * epoch_shuffle_docs — reproducible training-order shuffling:
    rank documents by md5('epoch2#' || doc_id) — a different but
    DETERMINISTIC permutation per epoch, identical across engines,
    reruns, and repartitioning (engine RNG is none of those).  The
    data-ordering twin of the md5-gated split/sample ops: together
    they make every stochastic-looking step of the training-data
    pipeline a pure function of (content, salt).  Emits the first 50
    positions of epoch 2's order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SHUFFLE_SQL = """
    WITH keyed AS (
      SELECT doc_id,
             md5('epoch2#' || CAST(doc_id AS VARCHAR)) AS sk
      FROM documents
    )
    SELECT doc_id, position FROM (
      SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) AS position
      FROM keyed)
    WHERE position <= 50
"""


@register("epoch_shuffle_docs", _SHUFFLE_SQL)
def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 50 positions of the epoch-2 training order.  The global
    rank here is presentation only — at scale the md5 key IS the
    shuffle (repartitionByRange + sortWithinPartitions on sk gives
    every worker its slice of the same global order without any
    ranking), which is exactly the range-clustering machinery already
    evidenced in the layout tests."""
    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch2#"), F.col("doc_id").cast("string"))).alias("sk"),
    )
    w = Window.orderBy("sk", "doc_id")
    return (
        keyed.select("doc_id", F.row_number().over(w).alias("position"))
        .filter(F.col("position") <= 50)
    )
