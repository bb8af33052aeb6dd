"""Two-hundred-first oracle-registry module: network-calculus
characterizations of the event arrival process — the envelope and
large-deviations views that turn a traffic trace into provisioning
numbers.

  * arrival_envelope_events — empirical arrival curve / leaky-bucket
    envelope: per-minute counts, then for window lengths w = 1, 5,
    15, 60 minutes the MAXIMUM arrivals in any w-minute sliding
    window (a range-frame window max over the dense minute grid).
    Fitting the last two points gives the (sigma, rho) token-bucket
    pair: rho = sustained rate, sigma = burst allowance — the
    shaper parameters that would pass this trace unthrottled
    (lindley_backlog_events then gives the queue for any smaller
    rate).

  * effective_bandwidth_events — Kelly's effective bandwidth
    alpha(theta) = (1/theta) ln E[exp(theta X)] of the per-minute
    arrival counts at theta = 0.01, 0.1, 0.5, 1.0 (computed
    stably as a log-sum-exp against the max count).  Monotone from
    the mean (theta→0) to the peak (theta→inf): the capacity to
    provision for a QoS exponent theta — the principled answer
    between "mean" and "max" sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MINUTES = """
    bounds AS (
      SELECT date_trunc('minute', MIN(ts)) AS m0,
             date_trunc('minute', MAX(ts)) AS m1
      FROM events
    ),
    grid AS (
      SELECT UNNEST(generate_series((SELECT m0 FROM bounds),
                                    (SELECT m1 FROM bounds),
                                    INTERVAL 1 MINUTE)) AS m
    ),
    arr AS (
      SELECT date_trunc('minute', ts) AS m, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT ROW_NUMBER() OVER (ORDER BY g.m) - 1 AS i,
             COALESCE(a.c, 0) AS c
      FROM grid g LEFT JOIN arr a ON a.m = g.m
    )
"""


_ENVELOPE_SQL = f"""
    WITH {_MINUTES},
    ws AS (SELECT UNNEST([1, 5, 15, 60]) AS w),
    roll AS (
      SELECT d.i, w.w,
             SUM(d2.c) AS s
      FROM dense d CROSS JOIN ws w
      JOIN dense d2 ON d2.i BETWEEN d.i - w.w + 1 AND d.i
      WHERE d.i >= w.w - 1
      GROUP BY d.i, w.w
    ),
    env AS (
      SELECT w, MAX(s) AS max_arrivals FROM roll GROUP BY w
    ),
    fit AS (
      SELECT (MAX(CASE WHEN w = 60 THEN max_arrivals END)
              - MAX(CASE WHEN w = 15 THEN max_arrivals END)) / 45.0 AS rho
      FROM env
    )
    SELECT e.w AS window_min,
           CAST(e.max_arrivals AS BIGINT) AS max_arrivals,
           ROUND(CAST(e.max_arrivals AS DOUBLE) / e.w, 4) AS rate_per_min,
           ROUND((SELECT rho FROM fit), 6) AS rho_sustained,
           ROUND(MAX(CASE WHEN e.w = 60 THEN e.max_arrivals END) OVER ()
                 - (SELECT rho FROM fit) * 60, 4) AS sigma_burst
    FROM env e
    ORDER BY window_min
"""


@register("arrival_envelope_events", _ENVELOPE_SQL)
def arrival_envelope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("m0"),
        F.date_trunc("minute", F.max("ts")).alias("m1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("m0", "m1", F.expr("INTERVAL 1 MINUTE"))
        ).alias("m")
    )
    arr = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count("*").alias("c")
    )
    dense = grid.join(arr, "m", "left").select(
        (F.row_number().over(Window.orderBy("m")) - 1).alias("i"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    ws = ev.sparkSession.createDataFrame(
        [(1,), (5,), (15,), (60,)], "w int"
    )
    withw = dense.crossJoin(F.broadcast(ws))
    wlag = Window.partitionBy("w").orderBy("i")
    cum = withw.withColumn(
        "cs",
        F.sum("c").over(wlag.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # windowed sum s(i, w) = cs_i - cs_{i-w}  (covers minutes i-w+1..i)
    lagw = cum.select(
        "w", "i", F.col("cs").alias("cs_lag")
    ).withColumn("i", F.col("i") + F.col("w"))
    roll = (
        cum.join(lagw, ["w", "i"], "left")
        .withColumn("s", F.col("cs") - F.coalesce("cs_lag", F.lit(0)))
        .where(F.col("i") >= F.col("w") - 1)
    )
    env = roll.groupBy("w").agg(F.max("s").alias("max_arrivals"))
    fit = env.agg(
        (
            (
                F.max(F.when(F.col("w") == 60, F.col("max_arrivals")))
                - F.max(F.when(F.col("w") == 15, F.col("max_arrivals")))
            )
            / 45.0
        ).alias("rho"),
        F.max(F.when(F.col("w") == 60, F.col("max_arrivals"))).alias("m60"),
    )
    return (
        env.crossJoin(F.broadcast(fit))
        .select(
            F.col("w").alias("window_min"),
            F.col("max_arrivals").cast("long").alias("max_arrivals"),
            F.round(
                F.col("max_arrivals").cast("double") / F.col("w"), 4
            ).alias("rate_per_min"),
            F.round("rho", 6).alias("rho_sustained"),
            F.round(F.col("m60") - F.col("rho") * 60, 4).alias("sigma_burst"),
        )
        .orderBy("window_min")
    )


_EB_SQL = f"""
    WITH {_MINUTES},
    thetas AS (SELECT CAST(UNNEST([0.01, 0.1, 0.5, 1.0]) AS DOUBLE) AS th),
    mx AS (SELECT MAX(c) AS mx, COUNT(*) AS n FROM dense),
    lse AS (
      SELECT t.th,
             (SELECT mx FROM mx) * t.th
               + LN(SUM(EXP(t.th * (d.c - (SELECT mx FROM mx))))
                    / (SELECT n FROM mx)) AS ln_mgf
      FROM dense d CROSS JOIN thetas t
      GROUP BY t.th
    )
    SELECT th AS theta,
           ROUND(ln_mgf / th, 6) AS effective_bandwidth,
           ROUND((SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) FROM dense), 6)
             AS mean_rate,
           CAST((SELECT mx FROM mx) AS BIGINT) AS peak_rate
    FROM lse
    ORDER BY theta
"""


@register("effective_bandwidth_events", _EB_SQL)
def effective_bandwidth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("m0"),
        F.date_trunc("minute", F.max("ts")).alias("m1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("m0", "m1", F.expr("INTERVAL 1 MINUTE"))
        ).alias("m")
    )
    arr = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count("*").alias("c")
    )
    dense = grid.join(arr, "m", "left").select(
        F.coalesce("c", F.lit(0)).alias("c")
    )
    mx = dense.agg(F.max("c").alias("mx"), F.count("*").alias("n"))
    mean_rate = dense.agg(
        (F.sum("c").cast("double") / F.count("*")).alias("mr")
    )
    thetas = ev.sparkSession.createDataFrame(
        [(0.01,), (0.1,), (0.5,), (1.0,)], "th double"
    )
    lse = (
        dense.crossJoin(F.broadcast(thetas))
        .crossJoin(F.broadcast(mx))
        .groupBy("th")
        .agg(
            (
                F.max("mx") * F.col("th")
                + F.log(
                    F.sum(
                        F.exp(F.col("th") * (F.col("c") - F.col("mx")))
                    )
                    / F.max("n")
                )
            ).alias("ln_mgf"),
            F.max("mx").alias("mxv"),
        )
    )
    return (
        lse.crossJoin(F.broadcast(mean_rate))
        .select(
            F.col("th").alias("theta"),
            F.round(F.col("ln_mgf") / F.col("th"), 6).alias(
                "effective_bandwidth"
            ),
            F.round("mr", 6).alias("mean_rate"),
            F.col("mxv").cast("long").alias("peak_rate"),
        )
        .orderBy("theta")
    )
