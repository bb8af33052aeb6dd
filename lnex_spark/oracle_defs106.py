"""Hundred-sixth oracle-registry module: instrumental variables and
budgeted best-arm search.

  * iv_wald_events — the Wald instrumental-variable estimator:
    instrument Z = the md5 encouragement coin, actual treatment T
    follows Z only for complier users (user_id % 3 != 0; the rest
    are user_id % 5 == 0 always-takers), outcome = value.  LATE =
    cov(Z,Y)/cov(Z,T), reported with the first-stage strength
    cov(Z,T)/var(Z) — the weak-instrument diagnostic that decides
    whether the estimate is usable.  Completes the causal suite
    with the design used when treatment itself cannot be
    randomized, only encouraged.

  * successive_halving_events — budgeted best-arm identification:
    round 1 scores all five event types on week 1 and keeps the top
    3 (rounded mean, type tiebreak); round 2 re-scores survivors on
    weeks 2-3 and keeps 1; the report shows each arm's round, score,
    and survival.  The elimination schedule behind hyperparameter
    search at scale — most of the measurement budget goes to
    promising arms, and the audit trail of WHO was eliminated WHEN
    is the op's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_IV_SQL = """
    WITH base AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1.0 ELSE 0.0 END AS z,
             user_id, value AS y
      FROM events
    ),
    treat AS (
      SELECT z, y,
             CASE WHEN user_id % 3 <> 0 THEN z
                  WHEN user_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS t
      FROM base
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(z * y) - AVG(z) * AVG(y) AS c_zy,
             AVG(z * t) - AVG(z) * AVG(t) AS c_zt,
             AVG(z * z) - AVG(z) * AVG(z) AS v_z,
             AVG(CASE WHEN z = 1 THEN y END) - AVG(CASE WHEN z = 0 THEN y END)
               AS itt
      FROM treat
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(itt, 6) AS itt_effect,
           ROUND(c_zt / v_z, 6) AS first_stage,
           ROUND(c_zy / c_zt, 6) AS late_wald
    FROM mom
"""


@register("iv_wald_events", _IV_SQL)
def iv_wald_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    z = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        1.0,
    ).otherwise(0.0)
    base = ev.select(z.alias("z"), "user_id", F.col("value").alias("y"))
    treat = base.select(
        "z",
        "y",
        F.when(F.col("user_id") % 3 != 0, F.col("z"))
        .when(F.col("user_id") % 5 == 0, 1.0)
        .otherwise(0.0)
        .alias("t"),
    )
    mom = treat.agg(
        F.count("*").alias("n"),
        (F.avg(F.col("z") * F.col("y")) - F.avg("z") * F.avg("y")).alias("c_zy"),
        (F.avg(F.col("z") * F.col("t")) - F.avg("z") * F.avg("t")).alias("c_zt"),
        (F.avg(F.col("z") * F.col("z")) - F.avg("z") * F.avg("z")).alias("v_z"),
        (
            F.avg(F.when(F.col("z") == 1, F.col("y")))
            - F.avg(F.when(F.col("z") == 0, F.col("y")))
        ).alias("itt"),
    )
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round("itt", 6).alias("itt_effect"),
        F.round(F.col("c_zt") / F.col("v_z"), 6).alias("first_stage"),
        F.round(F.col("c_zy") / F.col("c_zt"), 6).alias("late_wald"),
    )


_SH_SQL = """
    WITH r1 AS (
      SELECT event_type, COUNT(*) AS n1, ROUND(AVG(value), 6) AS m1
      FROM events WHERE ts < TIMESTAMP '2024-01-08'
      GROUP BY event_type
    ),
    r1_ranked AS (
      SELECT *, row_number() OVER (ORDER BY m1 DESC, event_type) AS rk1 FROM r1
    ),
    r2 AS (
      SELECT e.event_type, COUNT(*) AS n2, ROUND(AVG(e.value), 6) AS m2
      FROM events e JOIN r1_ranked s ON e.event_type = s.event_type AND s.rk1 <= 3
      WHERE e.ts >= TIMESTAMP '2024-01-08' AND e.ts < TIMESTAMP '2024-01-22'
      GROUP BY e.event_type
    ),
    r2_ranked AS (
      SELECT *, row_number() OVER (ORDER BY m2 DESC, event_type) AS rk2 FROM r2
    )
    SELECT a.event_type, a.n1, a.m1, a.rk1,
           b.n2, b.m2, b.rk2,
           CAST(a.rk1 <= 3 AS INTEGER) AS survived_r1,
           CAST(COALESCE(b.rk2, 99) = 1 AS INTEGER) AS winner
    FROM r1_ranked a LEFT JOIN r2_ranked b ON a.event_type = b.event_type
"""


@register("successive_halving_events", _SH_SQL)
def successive_halving_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    c1 = F.lit("2024-01-08").cast("timestamp")
    c2 = F.lit("2024-01-22").cast("timestamp")
    r1 = (
        ev.filter(F.col("ts") < c1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n1"), F.round(F.avg("value"), 6).alias("m1"))
    )
    # 5-row global windows throughout
    r1r = r1.withColumn(
        "rk1", F.row_number().over(Window.orderBy(F.desc("m1"), F.asc("event_type")))
    )
    r2 = (
        ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2))
        .join(
            r1r.filter(F.col("rk1") <= 3).select("event_type"),
            "event_type",
            "left_semi",
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n2"), F.round(F.avg("value"), 6).alias("m2"))
    )
    r2r = r2.withColumn(
        "rk2", F.row_number().over(Window.orderBy(F.desc("m2"), F.asc("event_type")))
    )
    return r1r.join(r2r, "event_type", "left").select(
        "event_type",
        "n1",
        "m1",
        "rk1",
        "n2",
        "m2",
        "rk2",
        (F.col("rk1") <= 3).cast("int").alias("survived_r1"),
        (F.coalesce(F.col("rk2"), F.lit(99)) == 1).cast("int").alias("winner"),
    )
