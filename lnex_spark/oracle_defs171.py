"""Hundred-seventy-first oracle-registry module: self-excitation and
multi-scale stability of the arrival process — two count-series
diagnostics over per-minute event bins.

  * hawkes_branching_events — moment-based branching-ratio estimate
    for a self-exciting (Hawkes) arrival process from per-minute
    counts: for an exponential-kernel Hawkes process the long-window
    count variance obeys var/mean = 1/(1-eta)^2, so
    eta_hat = 1 - sqrt(mean/var), clamped to [0, 1).  Reports the
    Fano factor (var/mean; 1 = Poisson) per event type and overall
    — the one-number answer to "are these arrivals bursty because
    they trigger each other", which burstiness_events describes but
    does not parameterize.

  * allan_variance_events — overlapping-free Allan variance of the
    per-minute count rate at block sizes tau = 1, 2, 4, 8, 16
    minutes: AVAR(tau) = 0.5 * mean((ybar_{k+1} - ybar_k)^2) over
    adjacent non-overlapping block means.  The log-log AVAR slope
    separates white noise (slope -1) from random-walk drift (slope
    +1) — the clock-stability tool applied to throughput monitoring;
    complements periodogram_events at the aggregation-scale axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HAWKES_SQL = """
    WITH bins AS (
      SELECT event_type, date_trunc('minute', ts) AS m,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n, AVG(c) AS mu,
             AVG(CAST(c AS DOUBLE) * c) - AVG(c) * AVG(c) AS v
      FROM bins GROUP BY event_type
      UNION ALL
      SELECT '_all', COUNT(*), AVG(c),
             AVG(CAST(c AS DOUBLE) * c) - AVG(c) * AVG(c)
      FROM (
        SELECT date_trunc('minute', ts) AS m, COUNT(*) AS c
        FROM events GROUP BY 1
      )
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_bins,
           ROUND(mu, 6) AS mean_count,
           ROUND(v / mu, 6) AS fano,
           ROUND(CASE WHEN v > 0 THEN GREATEST(0, 1 - SQRT(mu / v)) END, 6)
             AS eta_hat
    FROM stats
    ORDER BY event_type
"""


@register("hawkes_branching_events", _HAWKES_SQL)
def hawkes_branching_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def stats(df: DataFrame, label_col) -> DataFrame:
        bins = df.groupBy(
            label_col.alias("event_type"),
            F.date_trunc("minute", "ts").alias("m"),
        ).agg(F.count("*").alias("c"))
        return bins.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.avg("c").alias("mu"),
            (
                F.avg(F.col("c").cast("double") * F.col("c"))
                - F.avg("c") * F.avg("c")
            ).alias("v"),
        )

    per_type = stats(ev, F.col("event_type"))
    overall = stats(ev, F.lit("_all"))
    return (
        per_type.unionByName(overall)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_bins"),
            F.round("mu", 6).alias("mean_count"),
            F.round(F.col("v") / F.col("mu"), 6).alias("fano"),
            F.round(
                F.when(
                    F.col("v") > 0,
                    F.greatest(
                        F.lit(0.0), 1 - F.sqrt(F.col("mu") / F.col("v"))
                    ),
                ),
                6,
            ).alias("eta_hat"),
        )
        .orderBy("event_type")
    )


_ALLAN_SQL = """
    WITH bins AS (
      SELECT date_trunc('minute', ts) AS m, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY m) - 1 AS i,
             CAST(c AS DOUBLE) AS c
      FROM bins
    ),
    taus AS (SELECT UNNEST([1, 2, 4, 8, 16]) AS tau),
    blocks AS (
      SELECT t.tau, CAST(FLOOR(i.i / t.tau) AS BIGINT) AS b,
             AVG(i.c) AS ybar, COUNT(*) AS bn
      FROM idx i CROSS JOIN taus t
      GROUP BY t.tau, FLOOR(i.i / t.tau)
    ),
    full_blocks AS (
      SELECT tau, b, ybar FROM blocks WHERE bn = tau
    ),
    diffs AS (
      SELECT tau,
             LEAD(ybar) OVER (PARTITION BY tau ORDER BY b) - ybar AS d
      FROM full_blocks
    )
    SELECT tau, CAST(COUNT(d) AS BIGINT) AS n_pairs,
           ROUND(0.5 * AVG(d * d), 6) AS avar
    FROM diffs WHERE d IS NOT NULL
    GROUP BY tau
    ORDER BY tau
"""


@register("allan_variance_events", _ALLAN_SQL)
def allan_variance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bins = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count("*").alias("c")
    )
    idx = bins.select(
        (F.row_number().over(Window.orderBy("m")) - 1).alias("i"),
        F.col("c").cast("double").alias("c"),
    )
    taus = ev.sparkSession.createDataFrame(
        [(1,), (2,), (4,), (8,), (16,)], "tau int"
    )
    blocks = (
        idx.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.floor(F.col("i") / F.col("tau")).alias("b"))
        .agg(F.avg("c").alias("ybar"), F.count("*").alias("bn"))
        .where(F.col("bn") == F.col("tau"))
    )
    w = Window.partitionBy("tau").orderBy("b")
    diffs = blocks.select(
        "tau", (F.lead("ybar").over(w) - F.col("ybar")).alias("d")
    ).where(F.col("d").isNotNull())
    return (
        diffs.groupBy("tau")
        .agg(
            F.count("d").cast("long").alias("n_pairs"),
            F.round(0.5 * F.avg(F.col("d") * F.col("d")), 6).alias("avar"),
        )
        .orderBy("tau")
    )
