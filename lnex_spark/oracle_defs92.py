"""Ninety-second oracle-registry module: uplift targeting and peak
localization.

  * uplift_segments_events — the two-model uplift readout behind
    "which segment should we target": deterministic md5 treatment
    arms, user-bucket segments, per-segment treated-vs-control
    click-rate difference (uplift) ranked on rounded values so the
    targeting order is cross-engine exact.  Uplift ranking — not
    response ranking — is what separates persuadables from
    sure-things; exact integer counts throughout.

  * peak_days_events — local-maximum detection on the daily count
    series: a peak day strictly exceeds both neighbors AND the
    global daily mean (interior days only).  The localization
    companion to the burst/changepoint family at day granularity;
    two lags and one tiny cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_UPLIFT_SQL = """
    WITH base AS (
      SELECT user_id % 4 AS segment,
             CASE WHEN CAST(('0x' || substr(md5('uplift-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS resp
      FROM events
    ),
    cells AS (
      SELECT segment, treated, COUNT(*) AS n, SUM(resp) AS r
      FROM base GROUP BY segment, treated
    ),
    seg AS (
      SELECT segment,
             MAX(CASE WHEN treated = 1 THEN n END) AS n_t,
             MAX(CASE WHEN treated = 1 THEN r END) AS r_t,
             MAX(CASE WHEN treated = 0 THEN n END) AS n_c,
             MAX(CASE WHEN treated = 0 THEN r END) AS r_c
      FROM cells GROUP BY segment
    ),
    scored AS (
      SELECT segment, n_t, n_c,
             ROUND(r_t * 1.0 / n_t, 6) AS rate_t,
             ROUND(r_c * 1.0 / n_c, 6) AS rate_c,
             ROUND(r_t * 1.0 / n_t - r_c * 1.0 / n_c, 6) AS uplift
      FROM seg
    )
    SELECT segment, n_t, n_c, rate_t, rate_c, uplift,
           row_number() OVER (ORDER BY uplift DESC, segment) AS target_rank
    FROM scored
"""


@register("uplift_segments_events", _UPLIFT_SQL)
def uplift_segments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 4).alias("segment"),
        F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("uplift-v1#"), F.col("event_id").cast("string")
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            1,
        )
        .otherwise(0)
        .alias("treated"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("resp"),
    )
    cells = base.groupBy("segment", "treated").agg(
        F.count("*").alias("n"), F.sum("resp").alias("r")
    )
    seg = cells.groupBy("segment").agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("treated") == 1, F.col("r"))).alias("r_t"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("treated") == 0, F.col("r"))).alias("r_c"),
    )
    scored = seg.select(
        "segment",
        "n_t",
        "n_c",
        F.round(F.col("r_t") * 1.0 / F.col("n_t"), 6).alias("rate_t"),
        F.round(F.col("r_c") * 1.0 / F.col("n_c"), 6).alias("rate_c"),
        F.round(
            F.col("r_t") * 1.0 / F.col("n_t") - F.col("r_c") * 1.0 / F.col("n_c"), 6
        ).alias("uplift"),
    )
    # 4-row global window
    w = Window.orderBy(F.desc("uplift"), F.asc("segment"))
    return scored.select(
        "segment", "n_t", "n_c", "rate_t", "rate_c", "uplift",
        F.row_number().over(w).alias("target_rank"),
    )


_PEAK_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    ctx AS (
      SELECT day, y,
             lag(y) OVER (ORDER BY day) AS y_prev,
             lead(y) OVER (ORDER BY day) AS y_next
      FROM daily
    ),
    mean_y AS (SELECT AVG(y * 1.0) AS mu FROM daily)
    SELECT c.day, c.y, c.y_prev, c.y_next,
           ROUND(m.mu, 6) AS daily_mean
    FROM ctx c, mean_y m
    WHERE c.y_prev IS NOT NULL AND c.y_next IS NOT NULL
      AND c.y > c.y_prev AND c.y > c.y_next AND c.y * 1.0 > m.mu
"""


@register("peak_days_events", _PEAK_SQL)
def peak_days_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.count("*").alias("y"))
    # ~30-row calendar-bounded global window
    w = Window.orderBy("day")
    ctx = daily.select(
        "day",
        "y",
        F.lag("y").over(w).alias("y_prev"),
        F.lead("y").over(w).alias("y_next"),
    )
    mean_y = daily.agg(F.avg(F.col("y") * 1.0).alias("mu"))
    return (
        ctx.crossJoin(mean_y)
        .filter(
            F.col("y_prev").isNotNull()
            & F.col("y_next").isNotNull()
            & (F.col("y") > F.col("y_prev"))
            & (F.col("y") > F.col("y_next"))
            & (F.col("y") * 1.0 > F.col("mu"))
        )
        .select("day", "y", "y_prev", "y_next", F.round("mu", 6).alias("daily_mean"))
    )
