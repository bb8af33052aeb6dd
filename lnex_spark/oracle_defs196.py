"""Hundred-ninety-sixth oracle-registry module: modern robust scale
estimators on the daily mean series — the Rousseeuw-Croux
replacements for MAD and the efficiency-recovering biweight.

  * robust_scale_events — Sn = 1.1926 * lomed_i himed_j |x_i - x_j|
    and Qn = 2.2219 * {|x_i - x_j| : i < j}_(k) with k = C(h,2),
    h = floor(n/2) + 1 (both via explicit rank picks over the
    pairwise-difference table — n = 30 days, 435 pairs, bounded at
    any event volume), next to the classic MAD for comparison.
    Unlike MAD these need no symmetry assumption and reach 58% /
    82% Gaussian efficiency vs MAD's 37% — the scale estimates a
    robust z-score monitor should actually use.

  * biweight_midvariance_events — Tukey biweight midvariance and
    one-step biweight location: u_i = (x_i - med)/(9 MAD), weights
    (1-u^2)^2 on |u| < 1, location = med + sum w (x - med)/sum w,
    midvariance = n sum (x-med)^2 (1-u^2)^4 /
    (sum (1-u^2)(1-5u^2))^2.  Soft-rejects outliers instead of
    MAD's hard median cut — 86% efficiency while still 50%
    breakdown; the pair (location, sqrt midvariance) is the robust
    (mean, sd) drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAILY = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
"""


_ROBUST_SQL = f"""
    WITH daily AS ({_DAILY}),
    n AS (SELECT COUNT(*) AS n FROM daily),
    med AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(nn / 2.0) AS BIGINT)
                      THEN x END) AS med
      FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn,
                   COUNT(*) OVER () AS nn FROM daily)
    ),
    mad AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(nn / 2.0) AS BIGINT)
                      THEN ad END) AS mad
      FROM (
        SELECT ABS(x - (SELECT med FROM med)) AS ad,
               ROW_NUMBER() OVER (ORDER BY ABS(x - (SELECT med FROM med)), d)
                 AS rn,
               COUNT(*) OVER () AS nn
        FROM daily
      )
    ),
    himed AS (
      -- per i: high median (rank floor(n/2)+1) of |x_i - x_j| over all j
      SELECT i_d,
             MAX(CASE WHEN rn = (SELECT n FROM n) // 2 + 1
                      THEN ad END) AS hm
      FROM (
        SELECT a.d AS i_d, ABS(a.x - b.x) AS ad,
               ROW_NUMBER() OVER (PARTITION BY a.d
                                  ORDER BY ABS(a.x - b.x), b.d) AS rn
        FROM daily a JOIN daily b ON TRUE
      )
      GROUP BY i_d
    ),
    sn AS (
      SELECT 1.1926 * MAX(CASE WHEN rn = CAST(CEIL(nn / 2.0) AS BIGINT)
                               THEN hm END) AS sn
      FROM (SELECT hm, ROW_NUMBER() OVER (ORDER BY hm, i_d) AS rn,
                   COUNT(*) OVER () AS nn FROM himed)
    ),
    qn AS (
      SELECT 2.2219 * MAX(CASE WHEN rn =
               ((SELECT n FROM n) // 2 + 1) * ((SELECT n FROM n) // 2) // 2
                               THEN ad END) AS qn
      FROM (
        SELECT ABS(a.x - b.x) AS ad,
               ROW_NUMBER() OVER (ORDER BY ABS(a.x - b.x), a.d, b.d) AS rn
        FROM daily a JOIN daily b ON a.d < b.d
      )
    )
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
           ROUND((SELECT mad FROM mad) * 1.4826, 6) AS mad_scaled,
           ROUND((SELECT sn FROM sn), 6) AS sn,
           ROUND((SELECT qn FROM qn), 6) AS qn
    FROM n
"""


@register("robust_scale_events", _ROBUST_SQL)
def robust_scale_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    n = daily.count()
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def rank_pick(df, col, order, rank_expr, out):
        r = df.select(
            F.col(col),
            F.row_number().over(Window.orderBy(*order)).alias("rn"),
            F.count("*").over(wall).alias("nn"),
        )
        return r.agg(
            F.max(F.when(F.col("rn") == rank_expr, F.col(col))).alias(out)
        )

    med = rank_pick(
        daily, "x", ["x", "d"], F.ceil(F.col("nn") / 2.0).cast("long"), "med"
    )
    ad = daily.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("x") - F.col("med")).alias("ad"), "d"
    )
    mad = rank_pick(
        ad, "ad", ["ad", "d"], F.ceil(F.col("nn") / 2.0).cast("long"), "mad"
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pair_all = a.join(b, F.lit(True)).select(
        F.col("a.d").alias("i_d"),
        F.abs(F.col("a.x") - F.col("b.x")).alias("ad"),
        F.col("b.d").alias("j_d"),
    )
    wper = Window.partitionBy("i_d").orderBy("ad", "j_d")
    himed = (
        pair_all.withColumn("rn", F.row_number().over(wper))
        .where(F.col("rn") == n // 2 + 1)
        .select("i_d", F.col("ad").alias("hm"))
    )
    sn = rank_pick(
        himed, "hm", ["hm", "i_d"], F.ceil(F.col("nn") / 2.0).cast("long"), "s"
    ).select((1.1926 * F.col("s")).alias("sn"))
    pair_lt = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.abs(F.col("a.x") - F.col("b.x")).alias("ad"),
        F.col("a.d").alias("da"),
        F.col("b.d").alias("db"),
    )
    kq = (n // 2 + 1) * (n // 2) // 2
    qn = (
        pair_lt.select(
            "ad",
            F.row_number().over(Window.orderBy("ad", "da", "db")).alias("rn"),
        )
        .where(F.col("rn") == kq)
        .select((2.2219 * F.col("ad")).alias("qn"))
    )
    return (
        med.crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(sn))
        .crossJoin(F.broadcast(qn))
        .select(
            F.lit(n).cast("long").alias("n"),
            F.round(F.col("mad") * 1.4826, 6).alias("mad_scaled"),
            F.round("sn", 6).alias("sn"),
            F.round("qn", 6).alias("qn"),
        )
    )


_BIWEIGHT_SQL = f"""
    WITH daily AS ({_DAILY}),
    med AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(nn / 2.0) AS BIGINT)
                      THEN x END) AS med
      FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn,
                   COUNT(*) OVER () AS nn FROM daily)
    ),
    mad AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(nn / 2.0) AS BIGINT)
                      THEN ad END) AS mad
      FROM (
        SELECT ABS(x - (SELECT med FROM med)) AS ad,
               ROW_NUMBER() OVER (ORDER BY ABS(x - (SELECT med FROM med)), d)
                 AS rn,
               COUNT(*) OVER () AS nn
        FROM daily
      )
    ),
    u AS (
      SELECT x, (x - (SELECT med FROM med))
                  / (9 * (SELECT mad FROM mad)) AS u,
             x - (SELECT med FROM med) AS dx
      FROM daily
    ),
    inw AS (
      SELECT x, dx, u, (1 - u * u) AS om
      FROM u WHERE ABS(u) < 1
    ),
    agg AS (
      SELECT COUNT(*) AS n_used,
             SUM(om * om * dx) / SUM(om * om) AS loc_shift,
             (SELECT COUNT(*) FROM daily)
               * SUM(dx * dx * om * om * om * om)
               / POW(SUM(om * (1 - 5 * u * u)), 2) AS midvar
      FROM inw
    )
    SELECT CAST(n_used AS BIGINT) AS n_used,
           ROUND((SELECT med FROM med) + loc_shift, 6) AS biweight_location,
           ROUND(midvar, 6) AS biweight_midvariance,
           ROUND(SQRT(midvar), 6) AS biweight_scale
    FROM agg
"""


@register("biweight_midvariance_events", _BIWEIGHT_SQL)
def biweight_midvariance_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    n = daily.count()
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = daily.select(
        "x",
        "d",
        F.row_number().over(Window.orderBy("x", "d")).alias("rn"),
        F.count("*").over(wall).alias("nn"),
    )
    med = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nn") / 2.0).cast("long"),
                F.col("x"),
            )
        ).alias("med")
    )
    ad = daily.crossJoin(F.broadcast(med)).select(
        "x",
        "d",
        "med",
        F.abs(F.col("x") - F.col("med")).alias("ad"),
    )
    adr = ad.select(
        "ad",
        F.row_number().over(Window.orderBy("ad", "d")).alias("rn"),
        F.count("*").over(wall).alias("nn"),
    )
    mad = adr.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nn") / 2.0).cast("long"),
                F.col("ad"),
            )
        ).alias("mad")
    )
    u = (
        daily.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "x",
            "med",
            (F.col("x") - F.col("med")).alias("dx"),
            ((F.col("x") - F.col("med")) / (9 * F.col("mad"))).alias("u"),
        )
    )
    inw = u.where(F.abs("u") < 1).withColumn("om", 1 - F.col("u") * F.col("u"))
    agg = inw.agg(
        F.count("*").alias("n_used"),
        F.max("med").alias("med"),
        (
            F.sum(F.col("om") * F.col("om") * F.col("dx"))
            / F.sum(F.col("om") * F.col("om"))
        ).alias("loc_shift"),
        (
            F.lit(n)
            * F.sum(
                F.col("dx") * F.col("dx") * F.col("om") * F.col("om") * F.col("om") * F.col("om")
            )
            / F.pow(
                F.sum(F.col("om") * (1 - 5 * F.col("u") * F.col("u"))), 2
            )
        ).alias("midvar"),
    )
    return agg.select(
        F.col("n_used").cast("long").alias("n_used"),
        F.round(F.col("med") + F.col("loc_shift"), 6).alias(
            "biweight_location"
        ),
        F.round("midvar", 6).alias("biweight_midvariance"),
        F.round(F.sqrt("midvar"), 6).alias("biweight_scale"),
    )
