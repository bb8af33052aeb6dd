"""Sixty-fourth oracle-registry module: parametric calibration and
forecasting evaluation.

  * platt_scaling_docs — Platt scaling of the n_chars score for the
    lang='en' label: TWO unrolled Newton-Raphson steps on the
    2-parameter logistic p = sigmoid(a·z + b) (z standardized
    score), each step = four gradient/Hessian aggregates + the
    closed-form 2×2 solve, parameters ROUNDED to 9 per step (the
    round-each-iteration determinism of k-means/power-iteration
    applied to model fitting).  Emits (a, b) after each step and
    the final log-loss — the parametric sibling of
    isotonic_calibration_docs.

  * rolling_slope_events — 7-day trailing least-squares slope of the
    daily value series at every day, computed from five windowed raw
    moments over one RANGE-like ROWS frame: the trend-at-every-point
    composition of the window suite with the regr_* family.

  * mase_events — seasonal-naive forecast evaluation: predict each
    day's mean value with the value 7 days earlier, score with MASE
    (MAE of the model over MAE of the lag-1 naive on the same
    evaluable days).  The scale-free forecast gate; two lag windows
    and one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# platt_scaling_docs — 2 Newton steps, closed-form 2x2 solve per step
# ---------------------------------------------------------------------------


def _platt_sql() -> str:
    # z standardized via population moments; start at a=0, b=0.
    blocks = [
        """pts AS (
      SELECT (n_chars - (SELECT AVG(n_chars * 1.0) FROM documents))
             / (SELECT sqrt(AVG(n_chars * n_chars * 1.0) - AVG(n_chars * 1.0) * AVG(n_chars * 1.0))
                FROM documents) AS z,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    s0 AS (SELECT 0.0 AS a, 0.0 AS b)"""
    ]
    for r in range(1, 3):
        p = r - 1
        blocks.append(
            f"""g{r} AS (
      SELECT SUM((1.0 / (1.0 + exp(-(s.a * z + s.b))) - y) * z) AS ga,
             SUM(1.0 / (1.0 + exp(-(s.a * z + s.b))) - y) AS gb,
             SUM(1.0 / (1.0 + exp(-(s.a * z + s.b)))
                 * (1 - 1.0 / (1.0 + exp(-(s.a * z + s.b)))) * z * z) AS haa,
             SUM(1.0 / (1.0 + exp(-(s.a * z + s.b)))
                 * (1 - 1.0 / (1.0 + exp(-(s.a * z + s.b)))) * z) AS hab,
             SUM(1.0 / (1.0 + exp(-(s.a * z + s.b)))
                 * (1 - 1.0 / (1.0 + exp(-(s.a * z + s.b))))) AS hbb,
             MIN(s.a) AS a, MIN(s.b) AS b
      FROM pts, s{p} s
    ),
    s{r} AS (
      SELECT round(a - ( hbb * ga - hab * gb) / (haa * hbb - hab * hab), 9) AS a,
             round(b - (-hab * ga + haa * gb) / (haa * hbb - hab * hab), 9) AS b
      FROM g{r}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + """,
    loss AS (
      SELECT SUM(-(y * ln(1.0 / (1.0 + exp(-(s.a * z + s.b))))
                   + (1 - y) * ln(1 - 1.0 / (1.0 + exp(-(s.a * z + s.b)))))) / COUNT(*) AS ll
      FROM pts, s2 s
    )
    SELECT (SELECT round(a, 6) FROM s1) AS a1, (SELECT round(b, 6) FROM s1) AS b1,
           (SELECT round(a, 6) FROM s2) AS a2, (SELECT round(b, 6) FROM s2) AS b2,
           (SELECT round(ll, 6) FROM loss) AS log_loss
    """
    )


@register("platt_scaling_docs", _platt_sql())
def platt_scaling_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    mom = d.agg(
        F.avg(F.col("n_chars") * 1.0).alias("m"),
        F.sqrt(
            F.avg(F.col("n_chars") * F.col("n_chars") * 1.0)
            - F.avg(F.col("n_chars") * 1.0) * F.avg(F.col("n_chars") * 1.0)
        ).alias("s"),
    )
    pts = d.crossJoin(mom).select(
        ((F.col("n_chars") - F.col("m")) / F.col("s")).alias("z"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    a, b = 0.0, 0.0
    params = []
    for _ in range(2):
        sig = 1.0 / (1.0 + F.exp(-(F.lit(a) * F.col("z") + F.lit(b))))
        g = pts.agg(
            F.sum((sig - F.col("y")) * F.col("z")).alias("ga"),
            F.sum(sig - F.col("y")).alias("gb"),
            F.sum(sig * (1 - sig) * F.col("z") * F.col("z")).alias("haa"),
            F.sum(sig * (1 - sig) * F.col("z")).alias("hab"),
            F.sum(sig * (1 - sig)).alias("hbb"),
        ).collect()[0]
        det = g.haa * g.hbb - g.hab * g.hab
        a = round(a - (g.hbb * g.ga - g.hab * g.gb) / det, 9)
        b = round(b - (-g.hab * g.ga + g.haa * g.gb) / det, 9)
        params.append((a, b))
    sig = 1.0 / (1.0 + F.exp(-(F.lit(a) * F.col("z") + F.lit(b))))
    loss = pts.agg(
        (
            F.sum(-(F.col("y") * F.log(sig) + (1 - F.col("y")) * F.log(1 - sig)))
            / F.count("*")
        ).alias("ll")
    )
    return loss.select(
        F.lit(round(params[0][0], 6)).alias("a1"),
        F.lit(round(params[0][1], 6)).alias("b1"),
        F.lit(round(params[1][0], 6)).alias("a2"),
        F.lit(round(params[1][1], 6)).alias("b2"),
        F.round("ll", 6).alias("log_loss"),
    )


# ---------------------------------------------------------------------------
# rolling_slope_events
# ---------------------------------------------------------------------------

_RSLOPE_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, AVG(value) AS x FROM events GROUP BY 1
    ),
    idx AS (SELECT datediff('day', DATE '2024-01-01', d) AS t, x FROM daily),
    rolled AS (
      SELECT t, x,
             COUNT(*) OVER w AS n,
             SUM(t * 1.0) OVER w AS st,
             SUM(x) OVER w AS sx,
             SUM(t * x) OVER w AS stx,
             SUM(t * t * 1.0) OVER w AS stt
      FROM idx
      WINDOW w AS (ORDER BY t ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT t, ROUND(x, 6) AS x, n,
           ROUND((n * stx - st * sx) / (n * stt - st * st), 6) AS slope7
    FROM rolled WHERE n >= 3
"""


@register("rolling_slope_events", _RSLOPE_SQL)
def rolling_slope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(F.avg("value").alias("x"))
    idx = daily.select(
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).alias("t"), "x"
    )
    w = Window.orderBy("t").rowsBetween(-6, 0)
    rolled = idx.select(
        "t",
        "x",
        F.count("*").over(w).alias("n"),
        F.sum(F.col("t") * 1.0).over(w).alias("st"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("t") * F.col("x")).over(w).alias("stx"),
        F.sum(F.col("t") * F.col("t") * 1.0).over(w).alias("stt"),
    )
    return rolled.filter(F.col("n") >= 3).select(
        "t",
        F.round("x", 6).alias("x"),
        "n",
        F.round(
            (F.col("n") * F.col("stx") - F.col("st") * F.col("sx"))
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")),
            6,
        ).alias("slope7"),
    )


# ---------------------------------------------------------------------------
# mase_events
# ---------------------------------------------------------------------------

_MASE_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, AVG(value) AS x FROM events GROUP BY 1
    ),
    idx AS (SELECT datediff('day', DATE '2024-01-01', d) AS t, x FROM daily),
    lagged AS (
      SELECT t, x,
             lag(x, 7) OVER (ORDER BY t) AS x7,
             lag(x, 1) OVER (ORDER BY t) AS x1
      FROM idx
    ),
    evaluable AS (
      SELECT abs(x - x7) AS e_model, abs(x - x1) AS e_naive
      FROM lagged WHERE x7 IS NOT NULL AND x1 IS NOT NULL
    )
    SELECT COUNT(*) AS n_days,
           ROUND(AVG(e_model), 6) AS mae_seasonal,
           ROUND(AVG(e_naive), 6) AS mae_naive1,
           ROUND(AVG(e_model) / AVG(e_naive), 6) AS mase
    FROM evaluable
"""


@register("mase_events", _MASE_SQL)
def mase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(F.avg("value").alias("x"))
    idx = daily.select(
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).alias("t"), "x"
    )
    w = Window.orderBy("t")
    lagged = idx.select(
        "x", F.lag("x", 7).over(w).alias("x7"), F.lag("x", 1).over(w).alias("x1")
    )
    ev_ = lagged.filter(F.col("x7").isNotNull() & F.col("x1").isNotNull()).select(
        F.abs(F.col("x") - F.col("x7")).alias("e_model"),
        F.abs(F.col("x") - F.col("x1")).alias("e_naive"),
    )
    return ev_.agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("e_model"), 6).alias("mae_seasonal"),
        F.round(F.avg("e_naive"), 6).alias("mae_naive1"),
        F.round(F.avg("e_model") / F.avg("e_naive"), 6).alias("mase"),
    )
