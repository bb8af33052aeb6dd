"""Hundred-eighty-ninth oracle-registry module: sampling-based
evaluation combinatorics — the two estimators an LLM/agent eval
pipeline runs over per-task trial tables.

  * pass_at_k_events — the unbiased pass@k estimator (Chen et al.,
    HumanEval): tasks = users with >= 10 purchase "trials", success
    = value > 50; pass@k = 1 - C(n-c, k)/C(n, k) computed as the
    product prod_{i<k} (n-c-i)/(n-i) via a k-term join (exact, no
    factorials), with the any-zero-term → pass@k = 1 guard.
    Averaged over tasks for k = 1, 5, 10.  The naive (c/n)^-based
    estimate is biased for k > 1; this is the correction every
    sampled-eval leaderboard needs.

  * condorcet_jury_events — Condorcet jury / majority-vote accuracy:
    per event type the per-trial accuracy p = share(value > 50)
    (ROUNDED to 6), then P(majority of n correct) for odd ensembles
    n = 5, 11, 21 from the exact binomial tail, ln C(n,k) built by
    the cumulative-log window trick.  Quantifies the
    self-consistency / ensemble-of-judges gain: p > 0.5 amplifies
    toward 1 with n, p < 0.5 collapses toward 0 — the math behind
    majority-vote eval aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PASSK_SQL = """
    WITH tasks AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS c
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 10
    ),
    ks AS (SELECT UNNEST([1, 5, 10]) AS k),
    terms AS (
      SELECT t.user_id, ks.k, i.i,
             CAST(t.n - t.c - i.i AS DOUBLE) / (t.n - i.i) AS term
      FROM tasks t CROSS JOIN ks
      JOIN (SELECT UNNEST(range(0, 10)) AS i) i ON i.i < ks.k
    ),
    per_task AS (
      SELECT user_id, k,
             MAX(CASE WHEN term <= 0 THEN 1 ELSE 0 END) AS any_zero,
             SUM(LN(CASE WHEN term > 0 THEN term ELSE 1 END)) AS lnprod
      FROM terms GROUP BY user_id, k
    ),
    passk AS (
      SELECT user_id, k,
             CASE WHEN any_zero = 1 THEN 1.0
                  ELSE 1 - EXP(lnprod) END AS p
      FROM per_task
    )
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_tasks,
           ROUND(AVG(p), 6) AS pass_at_k
    FROM passk
    GROUP BY k
    ORDER BY k
"""


@register("pass_at_k_events", _PASSK_SQL)
def pass_at_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    tasks = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("c"),
        )
        .where(F.col("n") >= 10)
    )
    ks = ev.sparkSession.createDataFrame([(1,), (5,), (10,)], "k int")
    iis = ev.sparkSession.range(0, 10).select(F.col("id").alias("i"))
    terms = (
        tasks.crossJoin(F.broadcast(ks))
        .join(F.broadcast(iis), F.col("i") < F.col("k"))
        .select(
            "user_id",
            "k",
            (
                (F.col("n") - F.col("c") - F.col("i")).cast("double")
                / (F.col("n") - F.col("i"))
            ).alias("term"),
        )
    )
    per_task = terms.groupBy("user_id", "k").agg(
        F.max(F.when(F.col("term") <= 0, 1).otherwise(0)).alias("any_zero"),
        F.sum(
            F.log(F.when(F.col("term") > 0, F.col("term")).otherwise(1.0))
        ).alias("lnprod"),
    )
    passk = per_task.select(
        "k",
        F.when(F.col("any_zero") == 1, 1.0)
        .otherwise(1 - F.exp("lnprod"))
        .alias("p"),
    )
    return (
        passk.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_tasks"),
            F.round(F.avg("p"), 6).alias("pass_at_k"),
        )
        .orderBy("k")
    )


_JURY_SQL = """
    WITH acc AS (
      SELECT event_type,
             ROUND(AVG(CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END), 6) AS p
      FROM events GROUP BY event_type
    ),
    ns AS (SELECT UNNEST([5, 11, 21]) AS n),
    grid AS (
      SELECT a.event_type, a.p, ns.n, k.k
      FROM acc a CROSS JOIN ns
      JOIN (SELECT UNNEST(range(0, 22)) AS k) k ON k.k <= ns.n
    ),
    lnc AS (
      SELECT event_type, p, n, k,
             SUM(CASE WHEN k = 0 THEN 0.0
                      ELSE LN(CAST(n - k + 1 AS DOUBLE) / k) END)
               OVER (PARTITION BY event_type, n ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lnck
      FROM grid
    ),
    pmf AS (
      SELECT event_type, p, n, k,
             EXP(lnck + k * LN(p) + (n - k) * LN(1 - p)) AS prob
      FROM lnc WHERE p > 0 AND p < 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS jurors,
           ROUND(MAX(p), 6) AS p_single,
           ROUND(SUM(CASE WHEN 2 * k > n THEN prob ELSE 0 END), 6)
             AS p_majority
    FROM pmf
    GROUP BY event_type, n
    ORDER BY event_type, jurors
"""


@register("condorcet_jury_events", _JURY_SQL)
def condorcet_jury_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    acc = ev.groupBy("event_type").agg(
        F.round(
            F.avg(F.when(F.col("value") > 50, 1.0).otherwise(0.0)), 6
        ).alias("p")
    )
    ns = ev.sparkSession.createDataFrame([(5,), (11,), (21,)], "n int")
    kk = ev.sparkSession.range(0, 22).select(F.col("id").alias("k"))
    grid = (
        acc.crossJoin(F.broadcast(ns))
        .join(F.broadcast(kk), F.col("k") <= F.col("n"))
    )
    wc = (
        Window.partitionBy("event_type", "n")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lnc = grid.select(
        "event_type",
        "p",
        "n",
        "k",
        F.sum(
            F.when(F.col("k") == 0, 0.0).otherwise(
                F.log(
                    (F.col("n") - F.col("k") + 1).cast("double")
                    / F.when(F.col("k") != 0, F.col("k"))
                )
            )
        )
        .over(wc)
        .alias("lnck"),
    )
    pmf = lnc.where((F.col("p") > 0) & (F.col("p") < 1)).select(
        "event_type",
        "p",
        "n",
        "k",
        F.exp(
            F.col("lnck")
            + F.col("k") * F.log("p")
            + (F.col("n") - F.col("k")) * F.log(1 - F.col("p"))
        ).alias("prob"),
    )
    return (
        pmf.groupBy("event_type", "n")
        .agg(
            F.round(F.max("p"), 6).alias("p_single"),
            F.round(
                F.sum(
                    F.when(2 * F.col("k") > F.col("n"), F.col("prob")).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("p_majority"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("jurors"),
            "p_single",
            "p_majority",
        )
        .orderBy("event_type", "jurors")
    )
