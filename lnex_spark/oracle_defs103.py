"""Hundred-third oracle-registry module: private selection and tail
risk.

  * dp_exp_mechanism_events — the exponential mechanism, completing
    the DP mechanism suite (Laplace release = dp_noisy_counts,
    local randomized response = randomized_response): select the
    most common event type under epsilon=1 differential privacy,
    P(select t) ∝ exp(eps·u(t)/(2·Δu)) with utility = count and
    sensitivity 1.  Probabilities via the max-shift stable softmax
    (the logsumexp discipline), the selection made deterministic by
    the md5-Gumbel argmax trick (g = −ln(−ln(u)) on a content-hash
    uniform — the same derandomization contract as every sampling
    op here: a pure function of (data, salt)).

  * cvar_events — Value-at-Risk and Conditional VaR (expected
    shortfall) of the value stream per event type: VaR95 as an
    EXACT ordered row pick (percentile_disc discipline), CVaR =
    mean of the tail at or beyond it.  CVaR is coherent where VaR
    is not (it sees how bad the tail IS, not just where it starts)
    — the risk-metric pair for budget/latency tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_EXP_SQL = """
    WITH u AS (
      SELECT event_type, COUNT(*) * 1.0 AS util FROM events GROUP BY event_type
    ),
    mx AS (SELECT MAX(util) AS m FROM u),
    w AS (
      SELECT u.event_type, u.util, exp(0.5 * (u.util - mx.m)) AS wt
      FROM u CROSS JOIN mx
    ),
    z AS (SELECT SUM(wt) AS z FROM w),
    probs AS (
      SELECT w.event_type, w.util, w.wt / z.z AS p FROM w CROSS JOIN z
    ),
    gumbel AS (
      SELECT event_type, util, p,
             ln(p) - ln(-ln(
               (CAST(('0x' || substr(md5('expmech-v1#' || event_type), 1, 8))
                     AS BIGINT) + 1.0) / 4294967297.0)) AS g
      FROM probs
    )
    SELECT event_type, CAST(util AS BIGINT) AS util, ROUND(p, 6) AS select_prob,
           CAST(row_number() OVER (ORDER BY g DESC, event_type) = 1 AS INTEGER)
             AS selected
    FROM gumbel
"""


@register("dp_exp_mechanism_events", _EXP_SQL)
def dp_exp_mechanism_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("event_type").agg((F.count("*") * 1.0).alias("util"))
    mx = u.agg(F.max("util").alias("m"))
    w = u.crossJoin(mx).select(
        "event_type", "util", F.exp(0.5 * (F.col("util") - F.col("m"))).alias("wt")
    )
    z = w.agg(F.sum("wt").alias("z"))
    probs = w.crossJoin(z).select(
        "event_type", "util", (F.col("wt") / F.col("z")).alias("p")
    )
    uniform = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("expmech-v1#"), F.col("event_type"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 1.0
    ) / 4294967297.0
    gumbel = probs.select(
        "event_type",
        "util",
        "p",
        (F.log(F.col("p")) - F.log(-F.log(uniform))).alias("g"),
    )
    # 5-row global window
    wd = Window.orderBy(F.desc("g"), F.asc("event_type"))
    return gumbel.select(
        "event_type",
        F.col("util").cast("long").alias("util"),
        F.round("p", 6).alias("select_prob"),
        (F.row_number().over(wd) == 1).cast("int").alias("selected"),
    )


_CVAR_SQL = """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    var AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN value END)
               AS var95
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, CAST(v.n AS BIGINT) AS n,
           ROUND(v.var95, 6) AS var95,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           ROUND(AVG(r.value), 6) AS cvar95
    FROM ranked r JOIN var v ON r.event_type = v.event_type
    WHERE r.value >= v.var95
    GROUP BY r.event_type, v.n, v.var95
"""


@register("cvar_events", _CVAR_SQL)
def cvar_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    var = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.95).cast("long"), F.col("value"))
        ).alias("var95"),
    )
    return (
        ranked.select("event_type", "value")
        .join(var.select("event_type", "n", "var95"), "event_type")
        .filter(F.col("value") >= F.col("var95"))
        .groupBy("event_type", "n", "var95")
        .agg(
            F.count("*").cast("long").alias("n_tail"),
            F.round(F.avg("value"), 6).alias("cvar95"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round("var95", 6).alias("var95"),
            "n_tail",
            "cvar95",
        )
    )
