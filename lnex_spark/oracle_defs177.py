"""Hundred-seventy-seventh oracle-registry module: signal-descriptor
scalars for the daily mean-value series — the compact features a
monitoring system stores per metric per window.

  * hjorth_events — the Hjorth parameter trio: activity = var(y),
    mobility = sqrt(var(y') / var(y)), complexity =
    mobility(y') / mobility(y), with y' the first-difference series
    (population variances over the daily means ROUNDED to 6).
    Designed for EEG but exactly the right 3-number shape summary
    for any telemetry stream: power, dominant-frequency proxy, and
    waveform irregularity; the per-series companion to cid_events'
    pairwise complexity distance.

  * spectral_entropy_events — Shannon entropy of the normalized
    periodogram over the nonzero Fourier frequencies k = 1..n/2:
    P(k) = (sum y cos(2 pi k t / n))^2 + (sum y sin(...))^2 on the
    demeaned series via an explicit freq×point join (n = 30 days →
    trivially bounded), H normalized by ln(#freqs).  1 → white
    (flat spectrum), 0 → single dominant cycle; the one-number
    "is there seasonality at all" gate before stl_lite /
    periodogram drilldowns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HJORTH_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    d1 AS (
      SELECT y, y - LAG(y) OVER (ORDER BY d) AS dy,
             y - 2 * LAG(y) OVER (ORDER BY d)
               + LAG(y, 2) OVER (ORDER BY d) AS ddy
      FROM daily
    ),
    v AS (
      SELECT AVG(y * y) - AVG(y) * AVG(y) AS v0,
             AVG(CASE WHEN dy IS NOT NULL THEN dy * dy END)
               - AVG(dy) * AVG(dy) AS v1,
             AVG(CASE WHEN ddy IS NOT NULL THEN ddy * ddy END)
               - AVG(ddy) * AVG(ddy) AS v2
      FROM d1
    )
    SELECT ROUND(v0, 6) AS activity,
           ROUND(SQRT(v1 / v0), 6) AS mobility,
           ROUND(SQRT(v2 / v1) / SQRT(v1 / v0), 6) AS complexity
    FROM v
"""


@register("hjorth_events", _HJORTH_SQL)
def hjorth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    wo = Window.orderBy("d")
    d1 = daily.select(
        "y",
        (F.col("y") - F.lag("y").over(wo)).alias("dy"),
        (
            F.col("y") - 2 * F.lag("y").over(wo) + F.lag("y", 2).over(wo)
        ).alias("ddy"),
    )
    v = d1.agg(
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("v0"),
        (
            F.avg(F.when(F.col("dy").isNotNull(), F.col("dy") * F.col("dy")))
            - F.avg("dy") * F.avg("dy")
        ).alias("v1"),
        (
            F.avg(
                F.when(F.col("ddy").isNotNull(), F.col("ddy") * F.col("ddy"))
            )
            - F.avg("ddy") * F.avg("ddy")
        ).alias("v2"),
    )
    mob = F.sqrt(F.col("v1") / F.col("v0"))
    return v.select(
        F.round("v0", 6).alias("activity"),
        F.round(mob, 6).alias("mobility"),
        F.round(F.sqrt(F.col("v2") / F.col("v1")) / mob, 6).alias(
            "complexity"
        ),
    )


_TWO_PI = 2 * math.pi

_SPECENT_SQL = f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    pts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS t,
             y - (SELECT AVG(y) FROM daily) AS y
      FROM daily
    ),
    n AS (SELECT COUNT(*) AS n FROM pts),
    freqs AS (
      SELECT CAST(UNNEST(range(1, (SELECT n FROM n) // 2 + 1)) AS DOUBLE)
               AS k
    ),
    spec AS (
      SELECT f.k,
             POW(SUM(p.y * COS({_TWO_PI!r} * f.k * p.t
                              / (SELECT n FROM n))), 2)
             + POW(SUM(p.y * SIN({_TWO_PI!r} * f.k * p.t
                                 / (SELECT n FROM n))), 2) AS pw
      FROM freqs f CROSS JOIN pts p
      GROUP BY f.k
    ),
    norm AS (
      SELECT k, pw / SUM(pw) OVER () AS p, COUNT(*) OVER () AS nf
      FROM spec
    )
    SELECT CAST(MAX(nf) AS BIGINT) AS n_freqs,
           ROUND(-SUM(CASE WHEN p > 0 THEN p * LN(p) ELSE 0 END), 6) AS h,
           ROUND(-SUM(CASE WHEN p > 0 THEN p * LN(p) ELSE 0 END)
                 / LN(MAX(nf)), 6) AS h_norm
    FROM norm
"""


@register("spectral_entropy_events", _SPECENT_SQL)
def spectral_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    mu = daily.agg(F.avg("y").alias("mu"))
    pts = daily.crossJoin(F.broadcast(mu)).select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("t"),
        (F.col("y") - F.col("mu")).alias("y"),
    )
    n = pts.count()
    freqs = ev.sparkSession.range(1, n // 2 + 1).select(
        F.col("id").cast("double").alias("k")
    )
    ang = _TWO_PI * F.col("k") * F.col("t") / n
    spec = (
        F.broadcast(freqs)
        .crossJoin(pts)
        .groupBy("k")
        .agg(
            (
                F.pow(F.sum(F.col("y") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("y") * F.sin(ang)), 2)
            ).alias("pw")
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    norm = spec.select(
        "k",
        (F.col("pw") / F.sum("pw").over(wall)).alias("p"),
        F.count("*").over(wall).alias("nf"),
    )
    ent = -F.sum(
        F.when(F.col("p") > 0, F.col("p") * F.log("p")).otherwise(0.0)
    )
    return norm.agg(
        F.max("nf").cast("long").alias("n_freqs"),
        F.round(ent, 6).alias("h"),
        F.round(ent / F.log(F.max("nf").cast("double")), 6).alias("h_norm"),
    )
