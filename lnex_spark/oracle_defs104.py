"""Hundred-fourth oracle-registry module: clustered-sampling design
math and systematic selection.

  * design_effect_events — the design effect of user-clustered
    sampling: one-way ANOVA decomposition of value into
    between-user and within-user components, intraclass correlation
    ICC = (MSB − MSW)/(MSB + (m̄−1)·MSW) with the standard
    unequal-cluster-size m̄ correction, and DEFF = 1 + (m̄−1)·ICC —
    how many times more samples clustered selection needs over
    simple random sampling to reach the same variance.  The reason
    "sample whole conversations" and "sample random turns" are NOT
    interchangeable at 10^12 rows; closes the survey-design suite
    (Neyman allocation, Horvitz-Thompson, stratified gates).

  * systematic_sample_orders — every-k-th systematic sampling under
    a fully-specified order (totalprice, orderkey) with a
    deterministic md5 start offset: the sample, its exact integer
    cent mean vs the population mean, and the relative error.
    Systematic sampling is the scan-friendly design (one pass, no
    per-row RNG, perfectly even spacing) — and under a
    VALUE-ordered frame it is implicitly stratified, which the
    error readout makes visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DEFF_SQL = """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS m, AVG(value) AS ybar, SUM(value) AS ysum
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(m) AS n, SUM(ysum) / SUM(m) AS gmean,
             AVG(m * 1.0) AS mbar
      FROM per_user
    ),
    ssb AS (
      SELECT SUM(p.m * (p.ybar - t.gmean) * (p.ybar - t.gmean)) AS ss_between
      FROM per_user p CROSS JOIN tot t
    ),
    ssw AS (
      SELECT SUM((e.value - p.ybar) * (e.value - p.ybar)) AS ss_within
      FROM events e JOIN per_user p ON e.user_id = p.user_id
    ),
    ms AS (
      SELECT t.k, t.n, t.mbar,
             b.ss_between / (t.k - 1) AS msb,
             w.ss_within / (t.n - t.k) AS msw
      FROM tot t, ssb b, ssw w
    )
    SELECT CAST(k AS BIGINT) AS n_clusters, CAST(n AS BIGINT) AS n_rows,
           ROUND(mbar, 6) AS mean_cluster_size,
           ROUND((msb - msw) / (msb + (mbar - 1.0) * msw), 6) AS icc,
           ROUND(1.0 + (mbar - 1.0)
                 * ((msb - msw) / (msb + (mbar - 1.0) * msw)), 6) AS deff
    FROM ms
"""


@register("design_effect_events", _DEFF_SQL)
def design_effect_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("m"),
        F.avg("value").alias("ybar"),
        F.sum("value").alias("ysum"),
    )
    tot = per_user.agg(
        F.count("*").alias("k"),
        F.sum("m").alias("n"),
        (F.sum("ysum") / F.sum("m")).alias("gmean"),
        F.avg(F.col("m") * 1.0).alias("mbar"),
    )
    ssb = per_user.crossJoin(tot).agg(
        F.sum(
            F.col("m") * (F.col("ybar") - F.col("gmean")) * (F.col("ybar") - F.col("gmean"))
        ).alias("ss_between")
    )
    ssw = (
        ev.join(per_user.select("user_id", "ybar"), "user_id")
        .agg(
            F.sum((F.col("value") - F.col("ybar")) * (F.col("value") - F.col("ybar"))).alias(
                "ss_within"
            )
        )
    )
    ms = tot.crossJoin(ssb).crossJoin(ssw).select(
        "k",
        "n",
        "mbar",
        (F.col("ss_between") / (F.col("k") - 1)).alias("msb"),
        (F.col("ss_within") / (F.col("n") - F.col("k"))).alias("msw"),
    )
    icc = (F.col("msb") - F.col("msw")) / (
        F.col("msb") + (F.col("mbar") - 1.0) * F.col("msw")
    )
    return ms.select(
        F.col("k").cast("long").alias("n_clusters"),
        F.col("n").cast("long").alias("n_rows"),
        F.round("mbar", 6).alias("mean_cluster_size"),
        F.round(icc, 6).alias("icc"),
        F.round(1.0 + (F.col("mbar") - 1.0) * icc, 6).alias("deff"),
    )


_SYS_K = 20

_SYS_SQL = f"""
    WITH ranked AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
      FROM orders
    ),
    start AS (
      SELECT CAST(('0x' || substr(md5('sys-v1'), 1, 4)) AS BIGINT) % {_SYS_K} AS s
    ),
    sampled AS (
      SELECT r.o_orderkey, r.cents
      FROM ranked r CROSS JOIN start st
      WHERE (r.rk - 1) % {_SYS_K} = st.s
    ),
    agg AS (
      SELECT (SELECT COUNT(*) FROM ranked) AS n_pop,
             (SELECT SUM(cents) FROM ranked) AS pop_cents,
             (SELECT COUNT(*) FROM sampled) AS n_samp,
             (SELECT SUM(cents) FROM sampled) AS samp_cents
    )
    SELECT CAST(n_pop AS BIGINT) AS n_pop, CAST(n_samp AS BIGINT) AS n_samp,
           ROUND(pop_cents * 1.0 / n_pop / 100.0, 6) AS pop_mean,
           ROUND(samp_cents * 1.0 / n_samp / 100.0, 6) AS samp_mean,
           ROUND((samp_cents * 1.0 / n_samp) / (pop_cents * 1.0 / n_pop) - 1.0, 6)
             AS rel_err
    FROM agg
"""


@register("systematic_sample_orders", _SYS_SQL)
def systematic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from lnex_spark.operators.scalable_windows import attach_rank

    o = _t(spark, sf_dir, "orders")
    start = int(hashlib.md5(b"sys-v1").hexdigest()[:4], 16) % _SYS_K
    # distributed global rank (round-4 window audit): the rank runs
    # over ALL orders rows, so it must not shuffle to a single task
    ranked = attach_rank(
        o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()], rank_col="rk"
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "rk",
    )
    sampled = ranked.filter((F.col("rk") - 1) % _SYS_K == start)
    pop = ranked.agg(F.count("*").alias("n_pop"), F.sum("cents").alias("pop_cents"))
    samp = sampled.agg(
        F.count("*").alias("n_samp"), F.sum("cents").alias("samp_cents")
    )
    return pop.crossJoin(samp).select(
        F.col("n_pop").cast("long").alias("n_pop"),
        F.col("n_samp").cast("long").alias("n_samp"),
        F.round(F.col("pop_cents") * 1.0 / F.col("n_pop") / 100.0, 6).alias("pop_mean"),
        F.round(F.col("samp_cents") * 1.0 / F.col("n_samp") / 100.0, 6).alias(
            "samp_mean"
        ),
        F.round(
            (F.col("samp_cents") * 1.0 / F.col("n_samp"))
            / (F.col("pop_cents") * 1.0 / F.col("n_pop"))
            - 1.0,
            6,
        ).alias("rel_err"),
    )
