"""Hundred-seventy-ninth oracle-registry module: forecasting the
awkward cases — intermittent demand and hierarchy coherence.

  * croston_events — Croston's method on the DENSE hourly error-count
    series (zeros included, min..max hour grid): split into the
    nonzero-demand subsequence z_k and the inter-demand intervals
    p_k, apply simple exponential smoothing (alpha = 0.2) to each in
    CLOSED form — z_hat = sum_k alpha (1-alpha)^(K-k) z_k with the
    full remaining weight (1-alpha)^(K-1) on z_1, likewise for
    intervals — then demand rate = z_hat / p_hat and the
    Syntetos-Boylan approximation (1 - alpha/2) correction that
    fixes Croston's known positive bias.  SES-on-a-subsequence as
    power-weight window sums: no recursion, one pass.

  * forecast_reconciliation_events — one-step hierarchy
    reconciliation for the 5 per-type daily series + their total:
    drift forecasts (closed form y_n + (y_n - y_1)/(n-1)) computed
    independently per type AND for the direct total, then (a)
    bottom-up total = sum of type forecasts, (b) top-down type
    forecasts = direct-total forecast split by historical
    proportions.  Reports per-type direct / top-down values and the
    coherence gap (direct total - bottom-up) — nonzero gap is the
    incoherence every KPI tree suffers when each team forecasts its
    own node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_A = 0.2


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CROSTON_SQL = f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    grid AS (
      SELECT UNNEST(generate_series((SELECT h0 FROM bounds),
                                    (SELECT h1 FROM bounds),
                                    INTERVAL 1 HOUR)) AS h
    ),
    errs AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    dense AS (
      SELECT g.h, ROW_NUMBER() OVER (ORDER BY g.h) AS i,
             COALESCE(e.c, 0) AS z
      FROM grid g LEFT JOIN errs e ON e.h = g.h
    ),
    nz AS (
      SELECT z, i,
             ROW_NUMBER() OVER (ORDER BY i) AS k,
             COUNT(*) OVER () AS kk,
             CAST(i - COALESCE(LAG(i) OVER (ORDER BY i), 0) AS DOUBLE) AS p
      FROM dense WHERE z > 0
    ),
    ses AS (
      SELECT MAX(kk) AS kk,
             SUM(CASE WHEN k = 1 THEN POW(1 - {_A!r}, kk - 1) * z
                      ELSE {_A!r} * POW(1 - {_A!r}, kk - k) * z END) AS z_hat,
             SUM(CASE WHEN k = 1 THEN POW(1 - {_A!r}, kk - 1) * p
                      ELSE {_A!r} * POW(1 - {_A!r}, kk - k) * p END) AS p_hat
      FROM nz
    )
    SELECT CAST(kk AS BIGINT) AS n_demands,
           ROUND(z_hat, 6) AS z_hat,
           ROUND(p_hat, 6) AS p_hat,
           ROUND(z_hat / p_hat, 6) AS croston_rate,
           ROUND((1 - {_A!r} / 2) * z_hat / p_hat, 6) AS sba_rate
    FROM ses
"""


@register("croston_events", _CROSTON_SQL)
def croston_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    errs = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    dense = grid.join(errs, "h", "left").select(
        "h",
        F.row_number().over(Window.orderBy("h")).alias("i"),
        F.coalesce("c", F.lit(0)).alias("z"),
    )
    wo = Window.orderBy("i")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nz = dense.where(F.col("z") > 0).select(
        "z",
        "i",
        F.row_number().over(wo).alias("k"),
        F.count("*").over(wall).alias("kk"),
        (
            F.col("i") - F.coalesce(F.lag("i").over(wo), F.lit(0))
        )
        .cast("double")
        .alias("p"),
    )

    def ses(col):
        return F.sum(
            F.when(
                F.col("k") == 1,
                F.pow(1 - _A, F.col("kk") - 1) * F.col(col),
            ).otherwise(
                _A * F.pow(1 - _A, F.col("kk") - F.col("k")) * F.col(col)
            )
        )

    out = nz.agg(
        F.max("kk").alias("kk"),
        ses("z").alias("z_hat"),
        ses("p").alias("p_hat"),
    )
    return out.select(
        F.col("kk").cast("long").alias("n_demands"),
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("croston_rate"),
        F.round(
            (1 - _A / 2) * F.col("z_hat") / F.col("p_hat"), 6
        ).alias("sba_rate"),
    )


_RECON_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(SUM(value), 2) AS y
      FROM events GROUP BY 1, 2
    ),
    per_type AS (
      SELECT event_type,
             MAX_BY(y, d) + (MAX_BY(y, d) - MIN_BY(y, d)) / (COUNT(*) - 1)
               AS fc,
             SUM(y) AS hist
      FROM daily GROUP BY event_type
    ),
    total_series AS (
      SELECT d, SUM(y) AS y FROM daily GROUP BY d
    ),
    total_fc AS (
      SELECT MAX_BY(y, d) + (MAX_BY(y, d) - MIN_BY(y, d)) / (COUNT(*) - 1)
               AS fc
      FROM total_series
    ),
    hist_tot AS (SELECT SUM(hist) AS ht FROM per_type),
    bu AS (SELECT SUM(fc) AS bu FROM per_type)
    SELECT p.event_type,
           ROUND(p.fc, 2) AS direct_fc,
           ROUND((SELECT fc FROM total_fc) * p.hist
                 / (SELECT ht FROM hist_tot), 2) AS topdown_fc,
           ROUND((SELECT fc FROM total_fc), 2) AS total_direct,
           ROUND((SELECT bu FROM bu), 2) AS total_bottom_up,
           ROUND((SELECT fc FROM total_fc) - (SELECT bu FROM bu), 2) + 0
             AS coherence_gap
    FROM per_type p
    ORDER BY event_type
"""


@register("forecast_reconciliation_events", _RECON_SQL)
def forecast_reconciliation_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("y"))
    drift = (
        F.max_by("y", "d")
        + (F.max_by("y", "d") - F.min_by("y", "d")) / (F.count("*") - 1)
    )
    per_type = daily.groupBy("event_type").agg(
        drift.alias("fc"), F.sum("y").alias("hist")
    )
    total_series = daily.groupBy("d").agg(F.sum("y").alias("y"))
    total_fc = total_series.agg(drift.alias("tfc"))
    hist_tot = per_type.agg(F.sum("hist").alias("ht"))
    bu = per_type.agg(F.sum("fc").alias("bu"))
    return (
        per_type.crossJoin(F.broadcast(total_fc))
        .crossJoin(F.broadcast(hist_tot))
        .crossJoin(F.broadcast(bu))
        .select(
            "event_type",
            F.round("fc", 2).alias("direct_fc"),
            F.round(
                F.col("tfc") * F.col("hist") / F.col("ht"), 2
            ).alias("topdown_fc"),
            F.round("tfc", 2).alias("total_direct"),
            F.round("bu", 2).alias("total_bottom_up"),
            (F.round(F.col("tfc") - F.col("bu"), 2) + 0).alias(
                "coherence_gap"
            ),
        )
        .orderBy("event_type")
    )
