"""Hundred-sixtieth oracle-registry module: credibility-weighted
shrinkage and auxiliary-variable survey estimation — two estimators
for "combine a noisy per-entity signal with the collective".

  * buhlmann_credibility_events — Bühlmann-Straub credibility over
    per-user event values: collective mean m, expected process
    variance EPV = sum (n_i - 1) s_i^2 / sum (n_i - 1), variance of
    hypothetical means VHM = (sum n_i (xbar_i - m)^2 - (k-1) EPV)
    / (n - sum n_i^2 / n), credibility constant kappa = EPV/VHM and
    the exposure-weighted mean credibility Z = n_i/(n_i+kappa).
    The actuarial generalization of eb_shrinkage_users: it learns
    BOTH variance components from the data and yields the exact
    weight each user's own history deserves vs the book — the same
    partial-pooling a per-conv_id quality score needs at 10^12 turns.

  * ratio_estimator_orders — survey-sampling ratio estimator of
    total lineitem revenue from a deterministic 10% order sample
    (o_orderkey % 10 = 0) using o_totalprice as the auxiliary:
    R = sum_sample(rev)/sum_sample(price), est_total = R * total
    price over ALL orders, with the residual-based variance term
    N^2 (1-f)/n * s_e^2, e_i = y_i - R x_i, and the realized
    relative error vs the true total (computable here because the
    frame is complete).  The estimator a 100 TB pipeline uses to
    audit a full-table aggregate from a cheap correlated sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_BUHLMANN_SQL = """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n, AVG(value) AS xbar,
             (SUM(value * value) - COUNT(*) * AVG(value) * AVG(value))
               / NULLIF(COUNT(*) - 1, 0) AS s2
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn,
             SUM(CAST(n AS DOUBLE) * xbar) / SUM(n) AS m,
             SUM(CASE WHEN n > 1 THEN (n - 1) * s2 ELSE 0 END)
               / SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS epv,
             SUM(CAST(n AS DOUBLE) * n) AS sn2
      FROM per_user
    ),
    vhm AS (
      SELECT t.k, t.nn, t.m, t.epv,
             (SUM(u.n * (u.xbar - t.m) * (u.xbar - t.m))
              - (t.k - 1) * t.epv)
               / (t.nn - t.sn2 / t.nn) AS vhm
      FROM per_user u CROSS JOIN tot t
      GROUP BY t.k, t.nn, t.m, t.epv, t.sn2
    )
    SELECT v.k AS k_users, CAST(v.nn AS BIGINT) AS n,
           ROUND(v.m, 6) AS collective_mean,
           ROUND(v.epv, 6) AS epv,
           ROUND(v.vhm, 6) AS vhm,
           ROUND(v.epv / v.vhm, 6) AS kappa,
           ROUND(SUM(u.n * (u.n / (u.n + v.epv / v.vhm))) / SUM(u.n), 6)
             AS weighted_z
    FROM per_user u CROSS JOIN vhm v
    GROUP BY v.k, v.nn, v.m, v.epv, v.vhm
"""


@register("buhlmann_credibility_events", _BUHLMANN_SQL)
def buhlmann_credibility_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("xbar"),
        (
            (
                F.sum(F.col("value") * F.col("value"))
                - F.count("*") * F.avg("value") * F.avg("value")
            )
            / F.when(F.count("*") > 1, F.count("*") - 1)
        ).alias("s2"),
    )
    tot = per_user.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        (F.sum(F.col("n").cast("double") * F.col("xbar")) / F.sum("n")).alias("m"),
        (
            F.sum(F.when(F.col("n") > 1, (F.col("n") - 1) * F.col("s2")).otherwise(0.0))
            / F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        ).alias("epv"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("sn2"),
    )
    vhm = (
        per_user.crossJoin(F.broadcast(tot))
        .groupBy("k", "nn", "m", "epv", "sn2")
        .agg(
            (
                (
                    F.sum(
                        F.col("n")
                        * (F.col("xbar") - F.col("m"))
                        * (F.col("xbar") - F.col("m"))
                    )
                    - (F.col("k") - 1) * F.col("epv")
                )
                / (F.col("nn") - F.col("sn2") / F.col("nn"))
            ).alias("vhm")
        )
    )
    kappa = F.col("epv") / F.col("vhm")
    return (
        per_user.crossJoin(F.broadcast(vhm))
        .groupBy("k", "nn", "m", "epv", "vhm")
        .agg(
            F.round(
                F.sum(F.col("n") * (F.col("n") / (F.col("n") + kappa)))
                / F.sum("n"),
                6,
            ).alias("weighted_z")
        )
        .select(
            F.col("k").alias("k_users"),
            F.col("nn").cast("long").alias("n"),
            F.round("m", 6).alias("collective_mean"),
            F.round("epv", 6).alias("epv"),
            F.round("vhm", 6).alias("vhm"),
            F.round(kappa, 6).alias("kappa"),
            "weighted_z",
        )
    )


_RATIO_SQL = """
    WITH rev AS (
      SELECT o.o_orderkey, o.o_totalprice,
             COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS y
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    frame AS (
      SELECT COUNT(*) AS nn, ROUND(SUM(o_totalprice), 2) AS x_total,
             ROUND(SUM(y), 2) AS y_true
      FROM rev
    ),
    samp AS (
      SELECT COUNT(*) AS n, ROUND(SUM(y), 2) AS sy,
             ROUND(SUM(o_totalprice), 2) AS sx
      FROM rev WHERE o_orderkey % 10 = 0
    ),
    r AS (SELECT CAST(sy AS DOUBLE) / sx AS r, n FROM samp),
    resid AS (
      SELECT (SELECT n FROM r) AS n,
             SUM(POW(y - (SELECT r FROM r) * o_totalprice, 2))
               / ((SELECT n FROM r) - 1) AS se2
      FROM rev WHERE o_orderkey % 10 = 0
    )
    SELECT s.n AS n_sample, f.nn AS n_frame,
           ROUND((SELECT r FROM r), 6) AS r_hat,
           ROUND((SELECT r FROM r) * f.x_total, 2) AS est_total,
           f.y_true AS true_total,
           ROUND(((SELECT r FROM r) * f.x_total - f.y_true) / f.y_true, 6)
             AS rel_err,
           -- var_est is ~4e15: the residual-sum se2 is an order-dependent
           -- double sum whose engines differ by a few ulps (absolute ~5
           -- here), so cent-rounding can't stabilize it — round to the
           -- nearest 1e6 (9 significant digits, noise 5e5x below the step)
           ROUND(CAST(f.nn AS DOUBLE) * f.nn
                 * (1 - CAST(s.n AS DOUBLE) / f.nn) / s.n
                 * (SELECT se2 FROM resid), -6) AS var_est
    FROM samp s CROSS JOIN frame f
"""


@register("ratio_estimator_orders", _RATIO_SQL)
def ratio_estimator_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.coalesce(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.lit(0.0),
            ).alias("y")
        )
    )
    frame = rev.agg(
        F.count("*").alias("nn"),
        F.round(F.sum("o_totalprice"), 2).alias("x_total"),
        F.round(F.sum("y"), 2).alias("y_true"),
    )
    sample = rev.where(F.col("o_orderkey") % 10 == 0)
    samp = sample.agg(
        F.count("*").alias("n"),
        F.round(F.sum("y"), 2).alias("sy"),
        F.round(F.sum("o_totalprice"), 2).alias("sx"),
    ).withColumn("r", F.col("sy").cast("double") / F.col("sx"))
    resid = (
        sample.crossJoin(F.broadcast(samp))
        .agg(
            (
                F.sum(
                    F.pow(F.col("y") - F.col("r") * F.col("o_totalprice"), 2)
                )
                / (F.max("n") - 1)
            ).alias("se2")
        )
    )
    return (
        samp.crossJoin(F.broadcast(frame))
        .crossJoin(F.broadcast(resid))
        .select(
            F.col("n").alias("n_sample"),
            F.col("nn").alias("n_frame"),
            F.round("r", 6).alias("r_hat"),
            F.round(F.col("r") * F.col("x_total"), 2).alias("est_total"),
            F.col("y_true").alias("true_total"),
            F.round(
                (F.col("r") * F.col("x_total") - F.col("y_true"))
                / F.col("y_true"),
                6,
            ).alias("rel_err"),
            # round to 1e6, matching the oracle — see the SQL comment
            F.round(
                F.col("nn").cast("double")
                * F.col("nn")
                * (1 - F.col("n").cast("double") / F.col("nn"))
                / F.col("n")
                * F.col("se2"),
                -6,
            ).alias("var_est"),
        )
    )
