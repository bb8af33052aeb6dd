"""Eighty-seventh oracle-registry module: entity trending over the
verified KG pipeline, and post-selection inference.

  * kg_mention_bursts — burst detection per canonical entity over
    the REAL pipeline's output (Arrow matcher → link → canonicalize,
    the same independently-derived DuckDB twin as kg_e2e_sql):
    documents mapped onto a deterministic 30-day timeline
    (day = doc_id % 30), per-(entity, day) mention counts, and a
    day flagged as a burst when its count exceeds 2× the entity's
    mean daily count.  The "entity trending" readout a KG serving
    layer publishes; one more full-pipeline composition value check
    (matcher → link → canonical vote → temporal aggregation all
    inside a single hash compare).

  * winners_curse_events — the post-selection audit: pick the
    best-mean-value event type on the first half-month (argmax over
    ROUNDED means, type tiebreak — cross-engine exact), then report
    its held-out second-half mean next to the first-half mean and
    the optimism gap.  The winner's curse in one row: selected
    maxima regress toward the mean, which is why every "best
    segment" metric needs a held-out re-measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs2 import _SQL_LINK, _SQL_TOKENIZE
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_BURST_SQL = f"""
    WITH {_SQL_TOKENIZE},
    {_SQL_LINK},
    ment AS (
      SELECT c.canonical AS geo_id, w.doc_id % 30 AS day
      FROM winners w JOIN canon c ON w.norm = c.norm
    ),
    per_day AS (
      SELECT geo_id, day, COUNT(*) AS c FROM ment GROUP BY geo_id, day
    ),
    stats AS (
      SELECT geo_id, AVG(c * 1.0) AS mean_c FROM per_day GROUP BY geo_id
    )
    SELECT p.geo_id,
           COUNT(*) AS n_days_active,
           CAST(MAX(p.c) AS BIGINT) AS max_day_count,
           ROUND(MAX(s.mean_c), 6) AS mean_day_count,
           CAST(SUM(CASE WHEN p.c > 2.0 * s.mean_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_burst_days
    FROM per_day p JOIN stats s ON p.geo_id = s.geo_id
    GROUP BY p.geo_id
"""


@register("kg_mention_bursts", _BURST_SQL)
def kg_mention_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs2 import _oracle_mentions, _oracle_variants
    from lnex_spark.operators.link import (
        apply_canonical,
        canonicalize,
        link_mentions,
        score_candidates,
    )

    variants = _oracle_variants(spark)
    winners = score_candidates(link_mentions(_oracle_mentions(spark, sf_dir), variants))
    final = apply_canonical(winners, canonicalize(winners))
    ment = final.select(
        "geo_id", (F.col("conv_id").cast("long") % 30).alias("day")
    )
    per_day = ment.groupBy("geo_id", "day").agg(F.count("*").alias("c"))
    stats = per_day.groupBy("geo_id").agg(F.avg(F.col("c") * 1.0).alias("mean_c"))
    return (
        per_day.join(stats, "geo_id")
        .groupBy("geo_id")
        .agg(
            F.count("*").alias("n_days_active"),
            F.max("c").cast("long").alias("max_day_count"),
            F.round(F.max("mean_c"), 6).alias("mean_day_count"),
            F.sum(F.when(F.col("c") > 2.0 * F.col("mean_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_burst_days"),
        )
    )


_WC_SQL = """
    WITH halves AS (
      SELECT event_type, value, ts < TIMESTAMP '2024-01-16' AS first_half
      FROM events
    ),
    first_means AS (
      SELECT event_type, COUNT(*) AS n1, ROUND(AVG(value), 6) AS m1
      FROM halves WHERE first_half GROUP BY event_type
    ),
    pick AS (
      SELECT event_type, n1, m1 FROM first_means
      ORDER BY m1 DESC, event_type LIMIT 1
    ),
    second AS (
      SELECT h.event_type, COUNT(*) AS n2, ROUND(AVG(h.value), 6) AS m2
      FROM halves h JOIN pick p ON h.event_type = p.event_type
      WHERE NOT h.first_half GROUP BY h.event_type
    ),
    pooled2 AS (
      SELECT ROUND(AVG(value), 6) AS m2_all FROM halves WHERE NOT first_half
    )
    SELECT p.event_type AS winner, p.n1, p.m1,
           s.n2, s.m2, a.m2_all,
           ROUND(p.m1 - s.m2, 6) AS optimism_gap
    FROM pick p, second s, pooled2 a
"""


@register("winners_curse_events", _WC_SQL)
def winners_curse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    halves = ev.select(
        "event_type",
        "value",
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("first_half"),
    )
    first_means = (
        halves.filter("first_half")
        .groupBy("event_type")
        .agg(F.count("*").alias("n1"), F.round(F.avg("value"), 6).alias("m1"))
    )
    # single-row argmax over the tiny per-type table
    w = Window.orderBy(F.desc("m1"), F.asc("event_type"))
    pick = (
        first_means.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("event_type").alias("winner"), "n1", "m1")
    )
    second = (
        halves.filter(~F.col("first_half"))
        .join(pick, halves["event_type"] == pick["winner"], "left_semi")
        .groupBy("event_type")
        .agg(F.count("*").alias("n2"), F.round(F.avg("value"), 6).alias("m2"))
        .drop("event_type")
    )
    pooled2 = halves.filter(~F.col("first_half")).agg(
        F.round(F.avg("value"), 6).alias("m2_all")
    )
    return (
        pick.crossJoin(second)
        .crossJoin(pooled2)
        .select(
            "winner",
            "n1",
            "m1",
            "n2",
            "m2",
            "m2_all",
            F.round(F.col("m1") - F.col("m2"), 6).alias("optimism_gap"),
        )
    )
