"""Seventy-fifth oracle-registry module: sequential monitoring,
regression discontinuity, and sketch-based change detection.

  * hoeffding_seq_events — sequential A/B monitoring with a
    Hoeffding boundary: at every daily checkpoint, the running
    |rate difference| between the md5 arms against the
    delta=0.05 two-sided Hoeffding radius sqrt(ln(2/d)/(2n_min)) —
    the peeking-safe(ish) stopping rule a dashboard needs instead
    of re-testing daily at alpha=0.05.  Cumulative counts via one
    running window over the daily aggregate.

  * rdd_docs — sharp regression discontinuity at the n_chars=400
    cutoff for the lang='en' rate: local linear fits on each side
    within a ±150 window (closed-form least squares from raw
    moments, like regr_price_qty), the jump estimate = difference
    of the two fits AT the cutoff.  Completes the causal suite
    (randomized: ab/welch/power; observational: psm/did/cuped;
    discontinuity: here).

  * cm_movers_events — heavy-hitter CHANGE detection from two
    count-min sketches: the (user|type) key estimates for each
    half-month period (same 3x64 md5 sketch as countmin_events,
    one per period), top movers by |delta|.  Sketch-to-sketch
    comparison is the constant-memory form of before/after key
    profiling — two fixed-size aggregates however many keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs48 import _cm_bucket_spark, _cm_bucket_sql
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# hoeffding_seq_events
# ---------------------------------------------------------------------------

# sqrt(ln(2/0.05)/2) as a literal so both engines compute radius =
# _HOEFF_C / sqrt(n_min) identically.
_HOEFF_LN = "ln(2.0 / 0.05)"

_HOEFF_SQL = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    per_day AS (
      SELECT d,
             SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS ca,
             SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS cb
      FROM daily GROUP BY d
    ),
    running AS (
      SELECT d,
             SUM(na) OVER w AS na, SUM(ca) OVER w AS ca,
             SUM(nb) OVER w AS nb, SUM(cb) OVER w AS cb
      FROM per_day
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT d,
           na + nb AS n_total,
           ROUND(abs(ca * 1.0 / na - cb * 1.0 / nb), 6) AS abs_diff,
           ROUND(sqrt({_HOEFF_LN} / (2.0 * LEAST(na, nb))), 6) AS hoeffding_radius,
           CAST(abs(ca * 1.0 / na - cb * 1.0 / nb)
                > sqrt({_HOEFF_LN} / (2.0 * LEAST(na, nb))) AS INTEGER) AS crossed
    FROM running
"""


@register("hoeffding_seq_events", _HOEFF_SQL)
def hoeffding_seq_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.col("ts").cast("date").alias("d"),
        F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            "A",
        ).otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    per_day = daily.groupBy("d").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    running = per_day.select(
        "d",
        F.sum("na").over(w).alias("na"),
        F.sum("ca").over(w).alias("ca"),
        F.sum("nb").over(w).alias("nb"),
        F.sum("cb").over(w).alias("cb"),
    )
    diff = F.abs(F.col("ca") * 1.0 / F.col("na") - F.col("cb") * 1.0 / F.col("nb"))
    radius = F.sqrt(F.log(F.lit(2.0) / 0.05) / (2.0 * F.least("na", "nb")))
    return running.select(
        "d",
        (F.col("na") + F.col("nb")).alias("n_total"),
        F.round(diff, 6).alias("abs_diff"),
        F.round(radius, 6).alias("hoeffding_radius"),
        (diff > radius).cast("int").alias("crossed"),
    )


# ---------------------------------------------------------------------------
# rdd_docs
# ---------------------------------------------------------------------------


def _side_fit_sql(side: str, cond: str) -> str:
    return f"""
      SELECT '{side}' AS side, COUNT(*) AS n,
             AVG(x * 1.0) AS mx, AVG(y) AS my,
             AVG(x * 1.0 * y) AS mxy, AVG(x * 1.0 * x) AS mxx
      FROM pts WHERE {cond}
    """


_RDD_SQL = f"""
    WITH pts AS (
      SELECT n_chars - 400 AS x,
             CAST(lang = 'en' AS INTEGER) * 1.0 AS y
      FROM documents
      WHERE n_chars BETWEEN 250 AND 550
    ),
    fits AS (
      {_side_fit_sql("left", "x < 0")}
      UNION ALL
      {_side_fit_sql("right", "x >= 0")}
    ),
    params AS (
      SELECT side, n,
             (mxy - mx * my) / (mxx - mx * mx) AS slope,
             my - (mxy - mx * my) / (mxx - mx * mx) * mx AS intercept
      FROM fits
    ),
    wide AS (
      SELECT MAX(CASE WHEN side = 'left' THEN intercept END) AS y_left,
             MAX(CASE WHEN side = 'right' THEN intercept END) AS y_right,
             MAX(CASE WHEN side = 'left' THEN slope END) AS slope_left,
             MAX(CASE WHEN side = 'right' THEN slope END) AS slope_right,
             MAX(CASE WHEN side = 'left' THEN n END) AS n_left,
             MAX(CASE WHEN side = 'right' THEN n END) AS n_right
      FROM params
    )
    SELECT n_left, n_right,
           ROUND(y_left, 6) AS y_left,
           ROUND(y_right, 6) AS y_right,
           ROUND(slope_left, 6) AS slope_left,
           ROUND(slope_right, 6) AS slope_right,
           ROUND(y_right - y_left, 6) AS rd_jump
    FROM wide
"""


@register("rdd_docs", _RDD_SQL)
def rdd_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars").between(250, 550))
    pts = d.select(
        (F.col("n_chars") - 400).alias("x"),
        ((F.col("lang") == "en").cast("int") * 1.0).alias("y"),
    )

    def fit(cond, side):
        df = pts.filter(cond)
        mom = df.agg(
            F.count("*").alias("n"),
            F.avg(F.col("x") * 1.0).alias("mx"),
            F.avg("y").alias("my"),
            F.avg(F.col("x") * 1.0 * F.col("y")).alias("mxy"),
            F.avg(F.col("x") * 1.0 * F.col("x")).alias("mxx"),
        )
        slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
            F.col("mxx") - F.col("mx") * F.col("mx")
        )
        return mom.select(
            F.col("n").alias(f"n_{side}"),
            (F.col("my") - slope * F.col("mx")).alias(f"y_{side}"),
            slope.alias(f"slope_{side}"),
        )

    left = fit(F.col("x") < 0, "left")
    right = fit(F.col("x") >= 0, "right")
    return left.crossJoin(right).select(
        "n_left",
        "n_right",
        F.round("y_left", 6).alias("y_left"),
        F.round("y_right", 6).alias("y_right"),
        F.round("slope_left", 6).alias("slope_left"),
        F.round("slope_right", 6).alias("slope_right"),
        F.round(F.col("y_right") - F.col("y_left"), 6).alias("rd_jump"),
    )


# ---------------------------------------------------------------------------
# cm_movers_events
# ---------------------------------------------------------------------------

_CM_KEY = "(CAST(user_id AS VARCHAR) || '|' || event_type)"


def _cm_period_sql(period_cond: str, tag: str) -> str:
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row_id, {_cm_bucket_sql('key', i)} AS bucket, key FROM keyed_{tag}"
        for i in range(3)
    )
    return f"""
    keyed_{tag} AS (
      SELECT {_CM_KEY} AS key FROM events WHERE {period_cond}
    ),
    cells_{tag} AS ({cells}),
    sketch_{tag} AS (
      SELECT row_id, bucket, COUNT(*) AS cell_cnt FROM cells_{tag} GROUP BY row_id, bucket
    )"""


_MOVERS_SQL = f"""
    WITH {_cm_period_sql("CAST(ts AS DATE) < DATE '2024-01-16'", "p1")},
    {_cm_period_sql("CAST(ts AS DATE) >= DATE '2024-01-16'", "p2")},
    all_keys AS (
      SELECT DISTINCT {_CM_KEY} AS key FROM events
    ),
    probes AS (
      SELECT key, 0 AS row_id, {_cm_bucket_sql('key', 0)} AS bucket FROM all_keys
      UNION ALL
      SELECT key, 1, {_cm_bucket_sql('key', 1)} FROM all_keys
      UNION ALL
      SELECT key, 2, {_cm_bucket_sql('key', 2)} FROM all_keys
    ),
    est AS (
      SELECT p.key,
             MIN(COALESCE(s1.cell_cnt, 0)) AS est_p1,
             MIN(COALESCE(s2.cell_cnt, 0)) AS est_p2
      FROM probes p
      LEFT JOIN sketch_p1 s1 ON s1.row_id = p.row_id AND s1.bucket = p.bucket
      LEFT JOIN sketch_p2 s2 ON s2.row_id = p.row_id AND s2.bucket = p.bucket
      GROUP BY p.key
    )
    SELECT key, est_p1, est_p2, est_p2 - est_p1 AS delta
    FROM est
    ORDER BY abs(est_p2 - est_p1) DESC, key
    LIMIT 15
"""


@register("cm_movers_events", _MOVERS_SQL)
def cm_movers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    key = F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("event_type")).alias("key")

    def sketch(cond):
        keyed = ev.filter(cond).select(key)
        cells = keyed.select(
            "key",
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("row_id"), _cm_bucket_spark(F.col("key"), i).alias("bucket"))
                    for i in range(3)
                ])
            ).alias("c"),
        ).select("c.row_id", "c.bucket")
        return cells.groupBy("row_id", "bucket").agg(F.count("*").alias("cell_cnt"))

    s1 = sketch(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"))
    s2 = sketch(F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date"))
    all_keys = ev.select(key).distinct()
    probes = all_keys.select(
        "key",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row_id"), _cm_bucket_spark(F.col("key"), i).alias("bucket"))
                for i in range(3)
            ])
        ).alias("c"),
    ).select("key", "c.row_id", "c.bucket")
    est = (
        probes.join(F.broadcast(s1.withColumnRenamed("cell_cnt", "c1")), ["row_id", "bucket"], "left")
        .join(F.broadcast(s2.withColumnRenamed("cell_cnt", "c2")), ["row_id", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("c1"), F.lit(0))).alias("est_p1"),
            F.min(F.coalesce(F.col("c2"), F.lit(0))).alias("est_p2"),
        )
    )
    return (
        est.select("key", "est_p1", "est_p2", (F.col("est_p2") - F.col("est_p1")).alias("delta"))
        .orderBy(F.abs(F.col("est_p2") - F.col("est_p1")).desc(), F.col("key"))
        .limit(15)
    )
