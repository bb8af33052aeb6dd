"""Two-hundred-sixteenth oracle-registry module: forecast-readiness
diagnostics — how much structure a series has, and whether a live
forecast is drifting off it.

  * decomposition_strength_events — Hyndman's trend and seasonal
    strength for the daily series under the additive decomposition
    (trend = centered 7-day moving average over a rows frame,
    seasonal = day-of-week means of the detrended series):
    F_trend = max(0, 1 - var(remainder)/var(deseasonalized)),
    F_seas = max(0, 1 - var(remainder)/var(detrended)).  The two
    numbers that decide the forecasting approach: both near 0 →
    persistence is unbeatable (cross-check theil_u_events), high
    F_seas → seasonal-naive is the baseline to beat.

  * tracking_signal_events — Trigg's tracking signal for the
    one-step drift forecast (y_hat_t = y_{t-1} + closed-form drift
    from the first 10 days): per day the running sum of forecast
    errors divided by the running mean absolute error; |TS| > 4 is
    the classic re-fit alarm.  The forecast-monitoring loop in one
    window pass — CUSUM's forecasting twin, normalized so the
    threshold is scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DS_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, dayofweek(ts) AS dw,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT d, dw, y, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    trend AS (
      SELECT a.i, a.d, a.dw, a.y, AVG(b.y) AS tr
      FROM idx a JOIN idx b ON b.i BETWEEN a.i - 3 AND a.i + 3
      GROUP BY a.i, a.d, a.dw, a.y
      HAVING COUNT(*) = 7
    ),
    detr AS (
      SELECT i, dw, y, tr, y - tr AS dt FROM trend
    ),
    seas AS (
      SELECT dw, AVG(dt) AS s FROM detr GROUP BY dw
    ),
    comp AS (
      SELECT d.i, d.y, d.tr, s.s, d.dt, d.y - d.tr - s.s AS rem,
             d.y - s.s AS deseas
      FROM detr d JOIN seas s ON s.dw = d.dw
    ),
    vars_ AS (
      SELECT (AVG(rem * rem) - AVG(rem) * AVG(rem)) AS v_rem,
             (AVG(dt * dt) - AVG(dt) * AVG(dt)) AS v_detr,
             (AVG(deseas * deseas) - AVG(deseas) * AVG(deseas)) AS v_deseas,
             COUNT(*) AS n
      FROM comp
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(GREATEST(0, 1 - v_rem / v_deseas), 6) AS trend_strength,
           ROUND(GREATEST(0, 1 - v_rem / v_detr), 6) AS seasonal_strength,
           ROUND(v_rem, 6) AS remainder_var
    FROM vars_
"""


@register("decomposition_strength_events", _DS_SQL)
def decomposition_strength_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.dayofweek("ts").alias("dw"),
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    idx = daily.select(
        "d", "dw", "y", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    a = idx.alias("a")
    b = idx.alias("b")
    trend = (
        a.join(
            b,
            (F.col("b.i") >= F.col("a.i") - 3)
            & (F.col("b.i") <= F.col("a.i") + 3),
        )
        .groupBy(
            F.col("a.i").alias("i"),
            F.col("a.dw").alias("dw"),
            F.col("a.y").alias("y"),
        )
        .agg(F.avg("b.y").alias("tr"), F.count("*").alias("c"))
        .where(F.col("c") == 7)
    )
    detr = trend.select(
        "i", "dw", "y", "tr", (F.col("y") - F.col("tr")).alias("dt")
    )
    seas = detr.groupBy("dw").agg(F.avg("dt").alias("s"))
    comp = detr.join(F.broadcast(seas), "dw").select(
        "i",
        "dt",
        (F.col("y") - F.col("tr") - F.col("s")).alias("rem"),
        (F.col("y") - F.col("s")).alias("deseas"),
    )

    def v(c):
        return F.avg(F.col(c) * F.col(c)) - F.avg(c) * F.avg(c)

    vars_ = comp.agg(
        v("rem").alias("v_rem"),
        v("dt").alias("v_detr"),
        v("deseas").alias("v_deseas"),
        F.count("*").alias("n"),
    )
    return vars_.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.greatest(
                F.lit(0.0), 1 - F.col("v_rem") / F.col("v_deseas")
            ),
            6,
        ).alias("trend_strength"),
        F.round(
            F.greatest(F.lit(0.0), 1 - F.col("v_rem") / F.col("v_detr")), 6
        ).alias("seasonal_strength"),
        F.round("v_rem", 6).alias("remainder_var"),
    )


_TS_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    drift AS (
      SELECT (MAX_BY(y, i) - MIN_BY(y, i)) / (COUNT(*) - 1) AS c
      FROM idx WHERE i <= 10
    ),
    fc AS (
      SELECT i, d, y,
             LAG(y) OVER (ORDER BY i) + (SELECT c FROM drift) AS yhat
      FROM idx
    ),
    err AS (
      SELECT i, d, y - yhat AS e, ABS(y - yhat) AS ae
      FROM fc WHERE yhat IS NOT NULL
    ),
    ts AS (
      SELECT d,
             SUM(e) OVER (ORDER BY i) AS cfe,
             AVG(ae) OVER (ORDER BY i) AS mad
      FROM err
    )
    SELECT d AS day,
           ROUND(cfe, 6) + 0 AS cum_error,
           ROUND(mad, 6) AS running_mad,
           ROUND(cfe / mad, 4) + 0 AS tracking_signal,
           CASE WHEN ABS(cfe / mad) > 4 THEN 1 ELSE 0 END AS alarm
    FROM ts
    ORDER BY day
"""


@register("tracking_signal_events", _TS_SQL)
def tracking_signal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    idx = daily.select(
        "d", "y", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    drift = idx.where(F.col("i") <= 10).agg(
        (
            (F.max_by("y", "i") - F.min_by("y", "i")) / (F.count("*") - 1)
        ).alias("c")
    )
    wo = Window.orderBy("i")
    fc = idx.crossJoin(F.broadcast(drift)).select(
        "i",
        "d",
        "y",
        (F.lag("y").over(wo) + F.col("c")).alias("yhat"),
    )
    err = fc.where(F.col("yhat").isNotNull()).select(
        "i",
        "d",
        (F.col("y") - F.col("yhat")).alias("e"),
        F.abs(F.col("y") - F.col("yhat")).alias("ae"),
    )
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    ts = err.select(
        "d",
        F.sum("e").over(wc).alias("cfe"),
        F.avg("ae").over(wc).alias("mad"),
    )
    return ts.select(
        F.col("d").alias("day"),
        (F.round("cfe", 6) + 0).alias("cum_error"),
        F.round("mad", 6).alias("running_mad"),
        (F.round(F.col("cfe") / F.col("mad"), 4) + 0).alias(
            "tracking_signal"
        ),
        F.when(F.abs(F.col("cfe") / F.col("mad")) > 4, 1)
        .otherwise(0)
        .alias("alarm"),
    ).orderBy("day")
