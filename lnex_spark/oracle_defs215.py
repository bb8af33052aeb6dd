"""Two-hundred-fifteenth oracle-registry module: digit-preference
forensics — the demographer's data-quality indices applied to the
value column, completing the fabrication toolkit next to
benford_totalprice / last_digit_orders / hash_uniformity.

  * whipple_events — Whipple's index of heaping on terminal digits
    0 and 5 of round(value): W = 5 * #{ending 0 or 5} / N * 100 /
    ... expressed in the standard 0-500 scale (100 = no heaping,
    500 = everything heaps).  Self-reported or hand-keyed numbers
    heap on round values; sensor/ledger data does not — a W far
    from 100 in an "automated" feed means a human touched it.

  * myers_events — Myers' blended index over ALL terminal digits:
    the blending sums each digit's count over 10 shifted truncations
    (so genuine uniform digits blend to 10% each), MI = half the
    sum of |share - 10%| — 0 = no preference, 90 = total heaping on
    one digit.  Emits the per-digit blended shares AND the index;
    the digit histogram localizes WHICH digits a fabricator favors
    (humans overpick 0/5, underpick 1/8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_WHIPPLE_SQL = """
    WITH ints AS (
      SELECT CAST(ROUND(value, 0) AS BIGINT) AS v FROM events
      WHERE value >= 23 AND value <= 62
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_heaped,
           ROUND(500.0 * SUM(CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END)
                 / COUNT(*), 4) AS whipple_index
    FROM ints
"""


@register("whipple_events", _WHIPPLE_SQL)
def whipple_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ints = ev.where(
        (F.col("value") >= 23) & (F.col("value") <= 62)
    ).select(F.round("value", 0).cast("long").alias("v"))
    heap = F.sum(F.when(F.col("v") % 5 == 0, 1).otherwise(0))
    return ints.agg(
        F.count("*").cast("long").alias("n"),
        heap.cast("long").alias("n_heaped"),
        F.round(500.0 * heap / F.count("*"), 4).alias("whipple_index"),
    )


_MYERS_SQL = """
    WITH ints AS (
      SELECT CAST(ROUND(value, 0) AS BIGINT) AS v FROM events
      WHERE value >= 10
    ),
    shifted AS (
      SELECT (i.v + s.s) % 10 AS digit
      FROM ints i CROSS JOIN (SELECT UNNEST(range(0, 10)) AS s) s
    ),
    blended AS (
      SELECT digit, COUNT(*) AS c FROM shifted GROUP BY digit
    ),
    tot AS (SELECT SUM(c) AS t FROM blended)
    SELECT CAST(digit AS BIGINT) AS digit,
           ROUND(CAST(c AS DOUBLE) / (SELECT t FROM tot), 6)
             AS blended_share,
           ROUND(50 * SUM(ABS(CAST(c AS DOUBLE) / (SELECT t FROM tot)
                              - 0.1)) OVER (), 4) AS myers_index
    FROM blended
    ORDER BY digit
"""


@register("myers_events", _MYERS_SQL)
def myers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ints = ev.where(F.col("value") >= 10).select(
        F.round("value", 0).cast("long").alias("v")
    )
    shifts = ev.sparkSession.range(0, 10).select(F.col("id").alias("s"))
    shifted = ints.crossJoin(F.broadcast(shifts)).select(
        ((F.col("v") + F.col("s")) % 10).alias("digit")
    )
    blended = shifted.groupBy("digit").agg(F.count("*").alias("c"))
    tot = blended.agg(F.sum("c").alias("t"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        blended.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.round(F.col("c").cast("double") / F.col("t"), 6).alias(
                "blended_share"
            ),
            F.round(
                50
                * F.sum(
                    F.abs(F.col("c").cast("double") / F.col("t") - 0.1)
                ).over(wall),
                4,
            ).alias("myers_index"),
        )
        .orderBy("digit")
    )
