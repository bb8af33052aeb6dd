"""Hundred-eleventh oracle-registry module: joint tail behavior and
state holding times.

  * tail_dependence_events — empirical upper-tail dependence between
    the daily click and error counts: with each series' p75 as an
    exact ordered pick, lambda_U = P(Y > q_y | X > q_x), reported
    against the independence baseline P(Y > q_y).  Correlation says
    how series co-move on average; tail dependence says whether
    their EXTREMES co-occur — the distinction that decides if two
    alert streams can share an on-call budget.

  * sojourn_times_events — semi-Markov holding times: how long a
    user stays in each event-type state before the next event
    (microsecond-exact integer epoch differences), per-state count,
    mean, and exact-pick median sojourn seconds.  The timing half
    the transition-matrix ops (entropy rate, spectral gap, reach)
    deliberately ignore — together they specify the full
    semi-Markov process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TAIL_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    ),
    rx AS (
      SELECT x AS qx FROM (
        SELECT x, row_number() OVER (ORDER BY x, day) AS rk,
               COUNT(*) OVER () AS n
        FROM daily) WHERE rk = CAST(ceil(n * 0.75) AS BIGINT)
    ),
    ry AS (
      SELECT y AS qy FROM (
        SELECT y, row_number() OVER (ORDER BY y, day) AS rk,
               COUNT(*) OVER () AS n
        FROM daily) WHERE rk = CAST(ceil(n * 0.75) AS BIGINT)
    ),
    marked AS (
      SELECT d.x > rx.qx AS x_hi, d.y > ry.qy AS y_hi
      FROM daily d CROSS JOIN rx CROSS JOIN ry
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN x_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_x_hi,
           CAST(SUM(CASE WHEN x_hi AND y_hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both_hi,
           ROUND(SUM(CASE WHEN x_hi AND y_hi THEN 1.0 ELSE 0.0 END)
                 / NULLIF(SUM(CASE WHEN x_hi THEN 1 ELSE 0 END), 0), 6)
             AS lambda_upper,
           ROUND(AVG(CASE WHEN y_hi THEN 1.0 ELSE 0.0 END), 6) AS base_rate_y
    FROM marked
"""


@register("tail_dependence_events", _TAIL_SQL)
def tail_dependence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("y"),
    )

    def q75(col):
        # ~30-row calendar-bounded global window
        w = Window.orderBy(col, "day")
        wn = Window.partitionBy()
        return (
            daily.select(
                F.col(col).alias("v"),
                F.row_number().over(w).alias("rk"),
                F.count("*").over(wn).alias("n"),
            )
            .filter(F.col("rk") == F.ceil(F.col("n") * 0.75).cast("long"))
            .select(F.col("v").alias(f"q{col}"))
        )

    marked = (
        daily.crossJoin(q75("x"))
        .crossJoin(q75("y"))
        .select(
            (F.col("x") > F.col("qx")).alias("x_hi"),
            (F.col("y") > F.col("qy")).alias("y_hi"),
        )
    )
    return marked.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.when(F.col("x_hi"), 1).otherwise(0)).cast("long").alias("n_x_hi"),
        F.sum(F.when(F.col("x_hi") & F.col("y_hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_hi"),
        F.round(
            F.sum(F.when(F.col("x_hi") & F.col("y_hi"), 1.0).otherwise(0.0))
            / F.nullif(
                F.sum(F.when(F.col("x_hi"), 1).otherwise(0)).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("lambda_upper"),
        F.round(F.avg(F.when(F.col("y_hi"), 1.0).otherwise(0.0)), 6).alias(
            "base_rate_y"
        ),
    )


_SOJOURN_SQL = """
    WITH ordered AS (
      SELECT event_type AS s,
             CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                  - epoch_us(ts) AS BIGINT) AS hold_us
      FROM events
    ),
    holds AS (SELECT s, hold_us FROM ordered WHERE hold_us IS NOT NULL),
    ranked AS (
      SELECT s, hold_us,
             row_number() OVER (PARTITION BY s ORDER BY hold_us) AS rk,
             COUNT(*) OVER (PARTITION BY s) AS n
      FROM holds
    )
    SELECT s AS state, CAST(MAX(n) AS BIGINT) AS n_holds,
           ROUND(AVG(hold_us) / 1e6, 6) AS mean_sojourn_s,
           ROUND(MAX(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT)
                          THEN hold_us END) / 1e6, 6) AS median_sojourn_s
    FROM ranked GROUP BY s
"""


@register("sojourn_times_events", _SOJOURN_SQL)
def sojourn_times_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("s"),
        # ts is TIMESTAMP_NTZ in the parquet; unix_micros needs TIMESTAMP.
        # The session-tz offset cancels in the difference.
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("hold_us"),
    )
    holds = ordered.filter(F.col("hold_us").isNotNull())
    wr = Window.partitionBy("s").orderBy("hold_us")
    wn = Window.partitionBy("s")
    ranked = holds.select(
        "s",
        "hold_us",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy(F.col("s").alias("state")).agg(
        F.max("n").cast("long").alias("n_holds"),
        F.round(F.avg("hold_us") / 1e6, 6).alias("mean_sojourn_s"),
        F.round(
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.col("n") * 0.5).cast("long"),
                    F.col("hold_us"),
                )
            )
            / 1e6,
            6,
        ).alias("median_sojourn_s"),
    )
