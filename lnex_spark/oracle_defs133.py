"""Hundred-thirty-third oracle-registry module: time-series
seasonality + monotone-trend detection — the two tests the drift
suite (ks/cusum/changepoint) leans on upstream:

  * mann_kendall_events — the Mann-Kendall trend test over the daily
    event-count series: S = Σ_{i<j} sign(x_j − x_i) via a
    day-level self-join (bounded: the series is days, not rows),
    Var(S) with the exact tie correction Σ t(t−1)(2t+5), and the
    continuity-corrected z.  The nonparametric "is volume drifting
    up or down" answer that needs no distribution assumption —
    complements theilsen_events (which estimates the slope MK only
    tests).

  * periodogram_events — single-frequency DFT power of the
    mean-centered HOURLY count series at candidate periods 12h/24h/
    168h, over the complete hour grid (missing hours materialized as
    zeros via sequence + left join — a gapped grid biases every
    coefficient).  Power(p) = (A²+B²)·2/n with A=Σy·cos(2πt/p),
    B=Σy·sin(2πt/p): two aggregate passes, no FFT machinery, the
    deterministic seasonality readout behind choosing stl_lite's
    period.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_PI = "3.141592653589793"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MK_SQL = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT SUM(CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END) AS s_stat
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    ties AS (
      SELECT SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
    ),
    n AS (SELECT COUNT(*) AS n FROM daily),
    v AS (
      SELECT (n.n * (n.n - 1) * (2 * n.n + 5)
              - COALESCE(ties.tie_term, 0)) / 18.0 AS var_s
      FROM n CROSS JOIN ties
    )
    SELECT CAST(n.n AS BIGINT) AS n_days,
           CAST(s.s_stat AS BIGINT) AS s_stat,
           ROUND(v.var_s, 6) AS var_s,
           ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1) / sqrt(v.var_s)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1) / sqrt(v.var_s)
                      ELSE 0 END, 6) AS z
    FROM s CROSS JOIN v CROSS JOIN n
"""


@register("mann_kendall_events", _MK_SQL)
def mann_kendall_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = daily.agg(F.count("*").alias("n"))
    out = (
        s.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "var_s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce("tie_term", F.lit(0))
            )
            / 18.0,
        )
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt("var_s"),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt("var_s"),
        )
        .otherwise(F.lit(0.0))
    )
    return out.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s_stat").cast("long").alias("s_stat"),
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


_PGRAM_SQL = f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    grid AS (
      SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds
    ),
    series AS (
      SELECT g.h - b.h0 AS t, COALESCE(hh.c, 0) AS x
      FROM grid g
      LEFT JOIN hourly hh ON g.h = hh.h
      CROSS JOIN bounds b
    ),
    mu AS (SELECT AVG(x) AS m, COUNT(*) AS n FROM series),
    periods AS (SELECT unnest([12, 24, 168]) AS p),
    terms AS (
      SELECT p.p,
             SUM((s.x - mu.m) * cos(2 * {_PI} * s.t / p.p)) AS a,
             SUM((s.x - mu.m) * sin(2 * {_PI} * s.t / p.p)) AS b,
             MAX(mu.n) AS n
      FROM series s CROSS JOIN periods p CROSS JOIN mu
      GROUP BY p.p
    )
    SELECT CAST(p AS BIGINT) AS period_hours,
           ROUND(a, 6) AS a_coef,
           ROUND(b, 6) AS b_coef,
           ROUND((a * a + b * b) * 2 / n, 6) AS power
    FROM terms
"""


@register("periodogram_events", _PGRAM_SQL)
def periodogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pi = 3.141592653589793
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
    ).agg(F.count("*").alias("c"))
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h"), "h0"
    )
    series = grid.join(hourly, "h", "left").select(
        (F.col("h") - F.col("h0")).alias("t"),
        F.coalesce("c", F.lit(0)).alias("x"),
    )
    mu = series.agg(F.avg("x").alias("m"), F.count("*").alias("n"))
    periods = mu.sparkSession.createDataFrame(
        [(12,), (24,), (168,)], ["p"]
    )
    terms = (
        series.crossJoin(F.broadcast(periods))
        .crossJoin(F.broadcast(mu))
        .groupBy("p")
        .agg(
            F.sum(
                (F.col("x") - F.col("m"))
                * F.cos(2 * pi * F.col("t") / F.col("p"))
            ).alias("a"),
            F.sum(
                (F.col("x") - F.col("m"))
                * F.sin(2 * pi * F.col("t") / F.col("p"))
            ).alias("b"),
            F.max("n").alias("n"),
        )
    )
    return terms.select(
        F.col("p").cast("long").alias("period_hours"),
        F.round("a", 6).alias("a_coef"),
        F.round("b", 6).alias("b_coef"),
        F.round(
            (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
            * 2
            / F.col("n"),
            6,
        ).alias("power"),
    )
