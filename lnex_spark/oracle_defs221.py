"""Two-hundred-twenty-first oracle-registry module: utility-grid
load engineering applied to the event stream — the peak-shaping
numbers a capacity planner quotes.

  * load_factor_events — per-day load factor (mean hourly count /
    peak hourly count; 1 = flat, low = peaky) plus the fleet
    COINCIDENCE factor: sum of each event type's individual hourly
    peak over the combined peak.  Coincidence < 1 quantifies the
    diversity benefit — types don't peak together, so shared
    capacity can be smaller than the sum of per-type provisioning
    (the multiplexing argument for shared executor pools).

  * ramp_rate_events — ramp analysis of the hourly total:
    hour-over-hour deltas, the maximum up/down ramps with their
    hours, and the ramp duration curve at the 50/90/99 percentile of
    |delta| by explicit rank pick.  Capacity must chase the RAMP,
    not the level — autoscalers that size on mean load die on the
    p99 ramp, which this table reads off directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LF_SQL = """
    WITH hourly AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    daily_lf AS (
      SELECT d, AVG(CAST(c AS DOUBLE)) / MAX(c) AS lf FROM hourly GROUP BY d
    ),
    typed AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ind_peaks AS (
      SELECT SUM(mx) AS sum_ind FROM
        (SELECT event_type, MAX(c) AS mx FROM typed GROUP BY event_type)
    ),
    comb_peak AS (
      SELECT MAX(c) AS peak FROM
        (SELECT h, SUM(c) AS c FROM typed GROUP BY h)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(lf), 6) AS mean_daily_load_factor,
           ROUND(MIN(lf), 6) AS worst_daily_load_factor,
           ROUND((SELECT CAST(sum_ind AS DOUBLE) FROM ind_peaks)
                 / (SELECT peak FROM comb_peak), 6) AS coincidence_factor
    FROM daily_lf
"""


@register("load_factor_events", _LF_SQL)
def load_factor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.count("*").alias("c"))
    daily_lf = hourly.groupBy("d").agg(
        (F.avg(F.col("c").cast("double")) / F.max("c")).alias("lf")
    )
    typed = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    ind = typed.groupBy("event_type").agg(F.max("c").alias("mx"))
    sum_ind = ind.agg(F.sum("mx").alias("sum_ind"))
    comb = (
        typed.groupBy("h")
        .agg(F.sum("c").alias("c"))
        .agg(F.max("c").alias("peak"))
    )
    return (
        daily_lf.agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.avg("lf"), 6).alias("mean_daily_load_factor"),
            F.round(F.min("lf"), 6).alias("worst_daily_load_factor"),
        )
        .crossJoin(F.broadcast(sum_ind))
        .crossJoin(F.broadcast(comb))
        .select(
            "n_days",
            "mean_daily_load_factor",
            "worst_daily_load_factor",
            F.round(
                F.col("sum_ind").cast("double") / F.col("peak"), 6
            ).alias("coincidence_factor"),
        )
    )


_RAMP_SQL = """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    deltas AS (
      SELECT h, c - LAG(c) OVER (ORDER BY h) AS dlt
      FROM hourly
    ),
    ok AS (SELECT h, dlt FROM deltas WHERE dlt IS NOT NULL),
    ranked AS (
      SELECT ABS(dlt) AS a,
             ROW_NUMBER() OVER (ORDER BY ABS(dlt), h) AS rn,
             COUNT(*) OVER () AS nn
      FROM ok
    ),
    pct AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(0.5 * nn) AS BIGINT)
                      THEN a END) AS p50,
             MAX(CASE WHEN rn = CAST(CEIL(0.9 * nn) AS BIGINT)
                      THEN a END) AS p90,
             MAX(CASE WHEN rn = CAST(CEIL(0.99 * nn) AS BIGINT)
                      THEN a END) AS p99
      FROM ranked
    )
    SELECT CAST((SELECT COUNT(*) FROM ok) AS BIGINT) AS n_ramps,
           CAST((SELECT MAX(dlt) FROM ok) AS BIGINT) AS max_up_ramp,
           CAST((SELECT MIN(dlt) FROM ok) AS BIGINT) AS max_down_ramp,
           CAST(p.p50 AS BIGINT) AS p50_abs_ramp,
           CAST(p.p90 AS BIGINT) AS p90_abs_ramp,
           CAST(p.p99 AS BIGINT) AS p99_abs_ramp
    FROM pct p
"""


@register("ramp_rate_events", _RAMP_SQL)
def ramp_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("c")
    )
    wo = Window.orderBy("h")
    ok = hourly.select(
        "h", (F.col("c") - F.lag("c").over(wo)).alias("dlt")
    ).where(F.col("dlt").isNotNull())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = ok.select(
        F.abs("dlt").alias("a"),
        F.row_number().over(Window.orderBy(F.abs("dlt"), "h")).alias("rn"),
        F.count("*").over(wall).alias("nn"),
    )

    def pick(q, name):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(q * F.col("nn")).cast("long"),
                F.col("a"),
            )
        ).alias(name)

    pct = ranked.agg(
        pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99")
    )
    ext = ok.agg(
        F.count("*").alias("n_ramps"),
        F.max("dlt").alias("max_up"),
        F.min("dlt").alias("max_down"),
    )
    return ext.crossJoin(F.broadcast(pct)).select(
        F.col("n_ramps").cast("long").alias("n_ramps"),
        F.col("max_up").cast("long").alias("max_up_ramp"),
        F.col("max_down").cast("long").alias("max_down_ramp"),
        F.col("p50").cast("long").alias("p50_abs_ramp"),
        F.col("p90").cast("long").alias("p90_abs_ramp"),
        F.col("p99").cast("long").alias("p99_abs_ramp"),
    )
