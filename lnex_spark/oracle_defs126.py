"""Hundred-twenty-sixth oracle-registry module: cache modeling and
market concentration.

  * lru_stack_distance_events — Mattson stack-distance analysis of
    per-user event-type reference streams: each access's reuse
    distance = number of DISTINCT types touched since the previous
    access to the same type (infinite on first touch), giving the
    LRU hit ratio at EVERY cache size from one pass — hits at size
    s are exactly the accesses with distance < s.  The classic
    sequential Mattson algorithm becomes a per-user positional
    range self-join here (bounded: each user's stream is short and
    the alphabet is 5); emits the hit-ratio curve for sizes 1..4.
    The cache-sizing readout behind every "how big must the
    broadcast/dictionary cache be" decision.

  * hhi_events — the Herfindahl-Hirschman concentration index of
    daily event-type mix: HHI = Σ share² per day (10000-scaled like
    the antitrust convention), with the min/mean/max across days.
    The concentration complement of entropy: entropy counts the
    options, HHI weighs the dominance of the big ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LRU_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events
    ),
    with_prev AS (
      SELECT user_id, event_type, pos,
             lag(pos) OVER (PARTITION BY user_id, event_type ORDER BY pos) AS prev_pos
      FROM ordered
    ),
    dists AS (
      SELECT w.user_id, w.pos,
             COUNT(DISTINCT o.event_type) AS d
      FROM with_prev w
      JOIN ordered o ON o.user_id = w.user_id
        AND o.pos > w.prev_pos AND o.pos < w.pos
      WHERE w.prev_pos IS NOT NULL
      GROUP BY w.user_id, w.pos
    ),
    all_accesses AS (
      SELECT w.user_id, w.pos,
             CASE WHEN w.prev_pos IS NULL THEN NULL
                  ELSE COALESCE(d.d, 0) END AS dist
      FROM with_prev w
      LEFT JOIN dists d ON d.user_id = w.user_id AND d.pos = w.pos
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_accesses,
           CAST(SUM(CASE WHEN dist IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cold_misses,
           ROUND(AVG(CASE WHEN dist < 1 THEN 1.0 ELSE 0.0 END), 6) AS hit_ratio_1,
           ROUND(AVG(CASE WHEN dist < 2 THEN 1.0 ELSE 0.0 END), 6) AS hit_ratio_2,
           ROUND(AVG(CASE WHEN dist < 3 THEN 1.0 ELSE 0.0 END), 6) AS hit_ratio_3,
           ROUND(AVG(CASE WHEN dist < 4 THEN 1.0 ELSE 0.0 END), 6) AS hit_ratio_4
    FROM all_accesses
"""


@register("lru_stack_distance_events", _LRU_SQL)
def lru_stack_distance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("pos")
    )
    wk = Window.partitionBy("user_id", "event_type").orderBy("pos")
    with_prev = ordered.select(
        "user_id", "event_type", "pos", F.lag("pos").over(wk).alias("prev_pos")
    )
    o2 = ordered.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("t2"), F.col("pos").alias("p2")
    )
    dists = (
        with_prev.filter(F.col("prev_pos").isNotNull())
        .join(
            o2,
            (F.col("user_id") == F.col("u2"))
            & (F.col("p2") > F.col("prev_pos"))
            & (F.col("p2") < F.col("pos")),
        )
        .groupBy("user_id", "pos")
        .agg(F.countDistinct("t2").alias("d"))
    )
    all_accesses = with_prev.join(
        dists.select(F.col("user_id").alias("ud"), F.col("pos").alias("pd"), "d"),
        (F.col("user_id") == F.col("ud")) & (F.col("pos") == F.col("pd")),
        "left",
    ).select(
        F.when(F.col("prev_pos").isNull(), F.lit(None).cast("long"))
        .otherwise(F.coalesce(F.col("d"), F.lit(0)))
        .alias("dist"),
        "prev_pos",
    )

    def hr(s):
        return F.round(
            F.avg(F.when(F.col("dist") < s, 1.0).otherwise(0.0)), 6
        ).alias(f"hit_ratio_{s}")

    return all_accesses.agg(
        F.count("*").cast("long").alias("n_accesses"),
        F.sum(F.when(F.col("dist").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_cold_misses"),
        hr(1),
        hr(2),
        hr(3),
        hr(4),
    )


_HHI_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tots AS (SELECT day, SUM(c) AS n FROM daily GROUP BY day),
    hhi AS (
      SELECT d.day,
             SUM(pow(d.c * 10000.0 / t.n, 2)) / 10000.0 AS hhi
      FROM daily d JOIN tots t ON d.day = t.day
      GROUP BY d.day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MIN(hhi), 6) AS hhi_min,
           ROUND(AVG(hhi), 6) AS hhi_mean,
           ROUND(MAX(hhi), 6) AS hhi_max
    FROM hhi
"""


@register("hhi_events", _HHI_SQL)
def hhi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    tots = daily.groupBy("day").agg(F.sum("c").alias("n"))
    hhi = (
        daily.join(tots, "day")
        .groupBy("day")
        .agg(
            (F.sum(F.pow(F.col("c") * 10000.0 / F.col("n"), 2)) / 10000.0).alias("hhi")
        )
    )
    return hhi.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.min("hhi"), 6).alias("hhi_min"),
        F.round(F.avg("hhi"), 6).alias("hhi_mean"),
        F.round(F.max("hhi"), 6).alias("hhi_max"),
    )
