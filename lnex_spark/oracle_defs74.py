"""Seventy-fourth oracle-registry module: aggregate mergeability and
local differential privacy.

  * moments_merge_events — a mergeability proof for the (n, mean,
    M2) variance summary, the contract partial aggregation relies
    on: the events table is split into two md5 halves, each half's
    summary computed independently, merged with the Chan
    parallel-variance formula, and emitted next to the direct
    single-pass variance — the |delta| column is exactly 0-rounded (abs to dodge the -0.0 vs 0.0 canonical-form split).
    The same proof-by-construction as hll_union_users, for the
    algebraic (not sketch) aggregate family.

  * randomized_response_events — Warner's randomized response with a
    deterministic md5 coin (q = 0.75 truth probability): each event
    reports its purchase indicator truthfully with probability q,
    flipped otherwise; the debiased estimator
    p̂ = (obs − (1−q)) / (2q − 1) is emitted next to the true rate.
    The LOCAL-DP counterpart of dp_noisy_counts_events (central):
    privacy applied per record before any aggregation, the
    aggregate still recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MERGE_SQL = """
    WITH tagged AS (
      SELECT value,
             CAST(('0x' || substr(md5('half#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 AS half
      FROM events
    ),
    parts AS (
      SELECT half, COUNT(*) AS n, AVG(value) AS m,
             SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS m2
      FROM tagged GROUP BY half
    ),
    wide AS (
      SELECT MAX(CASE WHEN half = 0 THEN n END) AS na,
             MAX(CASE WHEN half = 0 THEN m END) AS ma,
             MAX(CASE WHEN half = 0 THEN m2 END) AS m2a,
             MAX(CASE WHEN half = 1 THEN n END) AS nb,
             MAX(CASE WHEN half = 1 THEN m END) AS mb,
             MAX(CASE WHEN half = 1 THEN m2 END) AS m2b
      FROM parts
    ),
    merged AS (
      SELECT na + nb AS n,
             (na * ma + nb * mb) / (na + nb) AS m,
             (m2a + m2b + (ma - mb) * (ma - mb) * na * nb / (na + nb)) / (na + nb) AS var_merged
      FROM wide
    ),
    direct AS (
      SELECT AVG(value * value) - AVG(value) * AVG(value) AS var_direct FROM tagged
    )
    SELECT m.n,
           ROUND(m.m, 6) AS mean_merged,
           ROUND(m.var_merged, 6) AS var_merged,
           ROUND(d.var_direct, 6) AS var_direct,
           ROUND(abs(m.var_merged - d.var_direct), 6) AS abs_delta
    FROM merged m, direct d
"""


@register("moments_merge_events", _MERGE_SQL)
def moments_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tagged = ev.select(
        "value",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("half#"), F.col("event_id").cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("half"),
    )
    parts = tagged.groupBy("half").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        (F.sum(F.col("value") * F.col("value")) - F.count("*") * F.avg("value") * F.avg("value")).alias("m2"),
    )
    wide = parts.agg(
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("half") == 0, F.col("m"))).alias("ma"),
        F.max(F.when(F.col("half") == 0, F.col("m2"))).alias("m2a"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("half") == 1, F.col("m"))).alias("mb"),
        F.max(F.when(F.col("half") == 1, F.col("m2"))).alias("m2b"),
    )
    n = F.col("na") + F.col("nb")
    m = (F.col("na") * F.col("ma") + F.col("nb") * F.col("mb")) / n
    var_merged = (
        F.col("m2a")
        + F.col("m2b")
        + (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")) * F.col("na") * F.col("nb") / n
    ) / n
    direct = tagged.agg(
        (F.avg(F.col("value") * F.col("value")) - F.avg("value") * F.avg("value")).alias(
            "var_direct"
        )
    )
    return wide.crossJoin(direct).select(
        n.cast("long").alias("n"),
        F.round(m, 6).alias("mean_merged"),
        F.round(var_merged, 6).alias("var_merged"),
        F.round("var_direct", 6).alias("var_direct"),
        F.round(F.abs(var_merged - F.col("var_direct")), 6).alias("abs_delta"),
    )


_RR_SQL = """
    WITH coins AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
             CASE WHEN CAST(('0x' || substr(md5('rr#' || CAST(event_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 4 < 3 THEN 1 ELSE 0 END AS honest
      FROM events
    ),
    reported AS (
      SELECT truth,
             CASE WHEN honest = 1 THEN truth ELSE 1 - truth END AS reported
      FROM coins
    )
    SELECT COUNT(*) AS n,
           ROUND(AVG(CAST(truth AS DOUBLE)), 6) AS true_rate,
           ROUND(AVG(CAST(reported AS DOUBLE)), 6) AS reported_rate,
           ROUND((AVG(CAST(reported AS DOUBLE)) - 0.25) / 0.5, 6) AS debiased_rate
    FROM reported
"""


@register("randomized_response_events", _RR_SQL)
def randomized_response_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    coins = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("truth"),
        F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("rr#"), F.col("event_id").cast("string"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(4),
            )
            < 3,
            1,
        ).otherwise(0).alias("honest"),
    )
    reported = coins.select(
        "truth",
        F.when(F.col("honest") == 1, F.col("truth")).otherwise(1 - F.col("truth")).alias(
            "reported"
        ),
    )
    return reported.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("truth").cast("double")), 6).alias("true_rate"),
        F.round(F.avg(F.col("reported").cast("double")), 6).alias("reported_rate"),
        F.round((F.avg(F.col("reported").cast("double")) - 0.25) / 0.5, 6).alias(
            "debiased_rate"
        ),
    )
