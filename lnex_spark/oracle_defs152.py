"""Hundred-fifty-second oracle-registry module: variance-component
reliability and statistical process control — the quality-engineering
pair on top of the ANOVA machinery.

  * icc_events — one-way random-effects intraclass correlation
    ICC(1,1) treating each DAY as a rater-group of purchase values:
    from per-group raw moments, MSB = SSB/(k-1), MSW = SSW/(N-k),
    unbalanced group-size correction k0 = (N - sum n_i^2 / N)/(k-1),
    ICC = (MSB - MSW)/(MSB + (k0-1) MSW).  Quantifies how much of
    the value variance is BETWEEN days vs within — the repeatability
    number that says whether per-day aggregates are stable enough to
    monitor (the precondition for every daily-drift op above).

  * p_chart_events — Shewhart p-chart of the daily error-event
    share: center line pbar = total errors / total events, per-day
    3-sigma limits pbar ± 3 sqrt(pbar(1-pbar)/n_i) (lower clipped at
    0), with an out-of-control flag per day.  The classic SPC
    monitor — one groupBy + one broadcast of the center line, no
    shuffle of raw rows beyond the daily rollup, so it runs at any
    event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ICC_SQL = """
    WITH g AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS ss
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s) AS stot,
             SUM(s * s / n) AS sb_raw, SUM(ss - s * s / n) AS ssw,
             SUM(CAST(n AS DOUBLE) * n) AS sn2
      FROM g
    ),
    ms AS (
      SELECT k, nn,
             (sb_raw - stot * stot / nn) / (k - 1) AS msb,
             ssw / (nn - k) AS msw,
             (nn - sn2 / nn) / (k - 1) AS k0
      FROM tot
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
           ROUND(msb, 6) AS msb, ROUND(msw, 6) AS msw,
           ROUND(k0, 6) AS k0,
           ROUND((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
    FROM ms
"""


@register("icc_events", _ICC_SQL)
def icc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    g = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb_raw"),
        F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("ssw"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("sn2"),
    )
    msb = (F.col("sb_raw") - F.col("stot") * F.col("stot") / F.col("nn")) / (
        F.col("k") - 1
    )
    msw = F.col("ssw") / (F.col("nn") - F.col("k"))
    k0 = (F.col("nn") - F.col("sn2") / F.col("nn")) / (F.col("k") - 1)
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("nn").cast("long").alias("n"),
        F.round(msb, 6).alias("msb"),
        F.round(msw, 6).alias("msw"),
        F.round(k0, 6).alias("k0"),
        F.round((msb - msw) / (msb + (k0 - 1) * msw), 6).alias("icc1"),
    )


_PCHART_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x
      FROM events GROUP BY 1
    ),
    center AS (
      SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS pbar FROM daily
    ),
    lim AS (
      SELECT d.d, d.n, CAST(d.x AS DOUBLE) / d.n AS p, c.pbar,
             c.pbar + 3 * SQRT(c.pbar * (1 - c.pbar) / d.n) AS ucl,
             GREATEST(0, c.pbar - 3 * SQRT(c.pbar * (1 - c.pbar) / d.n))
               AS lcl
      FROM daily d CROSS JOIN center c
    )
    SELECT d AS day, CAST(n AS BIGINT) AS n,
           ROUND(p, 6) AS p, ROUND(pbar, 6) AS pbar,
           ROUND(ucl, 6) AS ucl, ROUND(lcl, 6) AS lcl,
           CASE WHEN p > ucl OR p < lcl THEN 1 ELSE 0 END AS out_of_control
    FROM lim
    ORDER BY day
"""


@register("p_chart_events", _PCHART_SQL)
def p_chart_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("x"),
    )
    center = daily.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("pbar")
    )
    p = F.col("x").cast("double") / F.col("n")
    sig = F.sqrt(F.col("pbar") * (1 - F.col("pbar")) / F.col("n"))
    lim = daily.crossJoin(F.broadcast(center)).select(
        F.col("d").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(p, 6).alias("p"),
        F.round("pbar", 6).alias("pbar"),
        F.round(F.col("pbar") + 3 * sig, 6).alias("ucl"),
        F.round(F.greatest(F.lit(0.0), F.col("pbar") - 3 * sig), 6).alias("lcl"),
        F.when(
            (p > F.col("pbar") + 3 * sig)
            | (p < F.greatest(F.lit(0.0), F.col("pbar") - 3 * sig)),
            1,
        )
        .otherwise(0)
        .alias("out_of_control"),
    )
    return lim.orderBy("day")
