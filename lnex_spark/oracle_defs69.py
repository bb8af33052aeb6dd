"""Sixty-ninth oracle-registry module: cohort value curves, tail-index
estimation, and overdispersed-count fitting.

  * ltv_cohorts_events — cumulative value per cohort-age: users
    cohorted by first-seen day, per (cohort, day-offset) the running
    cumulative value per cohort user — the LTV curve that prices a
    cohort; the value-weighted sibling of retention_cohorts_events,
    one aggregation plus one cohort-keyed running window.

  * hill_tail_docs — the Hill estimator of the BIGRAM-frequency
    power-law tail index from the top-50 order statistics
    (mean log(x_i / x_k) over the k largest counts, alpha = 1/that):
    the tail-risk quantification behind the Zipf-slope fit
    (zipf_slope_docs regresses the whole curve; Hill reads only the
    tail, where the heavy-hitter risk lives).  Bigrams because the
    corpus's closed unigram vocabulary (31 types) has no rank-50
    order statistic; exact ordered pick for the threshold, integer
    counts into logs.

  * negbin_fit_events — negative-binomial fit by method of moments
    to per-(user, day) event counts: r = m²/(v−m), p = m/v, with the
    overdispersion ratio v/m and an explicit dispersion verdict —
    on THIS corpus the counts are underdispersed (v/m ≈ 0.7), so the
    op correctly refuses the NB parameters (NULL) and says why: the
    fit step that declines when the model does not apply is the
    honest parametric companion of the Fano burstiness diagnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LTV_SQL = """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
    ),
    sized AS (
      SELECT cohort, COUNT(*) AS cohort_users FROM firsts GROUP BY cohort
    ),
    daily AS (
      SELECT f.cohort, datediff('day', f.cohort, CAST(e.ts AS DATE)) AS age,
             SUM(e.value) AS day_value
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY f.cohort, datediff('day', f.cohort, CAST(e.ts AS DATE))
    )
    SELECT d.cohort, d.age, s.cohort_users,
           ROUND(SUM(d.day_value) OVER (PARTITION BY d.cohort ORDER BY d.age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / s.cohort_users, 6)
             AS cum_value_per_user
    FROM daily d JOIN sized s ON d.cohort = s.cohort
"""


@register("ltv_cohorts_events", _LTV_SQL)
def ltv_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort"))
    sized = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_users"))
    daily = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.col("ts").cast("date"), F.col("cohort")).alias("age"),
        )
        .agg(F.sum("value").alias("day_value"))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(sized, "cohort")
        .select(
            "cohort",
            "age",
            "cohort_users",
            F.round(F.sum("day_value").over(w) / F.col("cohort_users"), 6).alias(
                "cum_value_per_user"
            ),
        )
    )


_HILL_SQL = r"""
    WITH arrs AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents
    ),
    toks AS (
      SELECT ts[i] || ' ' || ts[i + 1] AS tok
      FROM arrs, (SELECT unnest(range(1, 2000)) AS i) r
      WHERE i + 1 <= len(ts)
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM freq
    ),
    thresh AS (SELECT c AS xk FROM ranked WHERE rk = 50),
    top AS (SELECT c FROM ranked WHERE rk < 50)
    SELECT 50 AS k,
           MIN(xk) AS x_k,
           ROUND(AVG(ln(c * 1.0 / xk)), 6) AS mean_log_excess,
           ROUND(1.0 / AVG(ln(c * 1.0 / xk)), 6) AS hill_alpha
    FROM top, thresh
"""


@register("hill_tail_docs", _HILL_SQL)
def hill_tail_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    arrs = d.select(F.split(F.lower(F.trim("text")), r"\s+").alias("ts"))
    toks = arrs.select(
        F.explode(
            F.expr("transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = freq.select("c", F.row_number().over(w).alias("rk"))
    thresh = ranked.filter(F.col("rk") == 50).select(F.col("c").alias("xk"))
    top = ranked.filter(F.col("rk") < 50).select("c")
    return top.crossJoin(thresh).agg(
        F.lit(50).alias("k"),
        F.min("xk").alias("x_k"),
        F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("xk"))), 6).alias("mean_log_excess"),
        F.round(1.0 / F.avg(F.log(F.col("c") * 1.0 / F.col("xk"))), 6).alias("hill_alpha"),
    )


_NEGBIN_SQL = """
    WITH counts AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS k
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(k * 1.0) AS m,
             (SUM(k * k * 1.0) - COUNT(*) * AVG(k * 1.0) * AVG(k * 1.0)) / (COUNT(*) - 1.0) AS v
      FROM counts
    )
    SELECT n,
           ROUND(m, 6) AS mean_k,
           ROUND(v, 6) AS var_k,
           ROUND(v / m, 6) AS overdispersion,
           CASE WHEN v > m THEN 'overdispersed' ELSE 'underdispersed' END AS dispersion_class,
           ROUND(CASE WHEN v > m THEN m * m / (v - m) END, 6) AS nb_r,
           ROUND(CASE WHEN v > m THEN m / v END, 6) AS nb_p
    FROM mom
"""


@register("negbin_fit_events", _NEGBIN_SQL)
def negbin_fit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("k")
    )
    mom = counts.agg(
        F.count("*").alias("n"),
        F.avg(F.col("k") * 1.0).alias("m"),
        (
            (F.sum(F.col("k") * F.col("k") * 1.0) - F.count("*") * F.avg(F.col("k") * 1.0) * F.avg(F.col("k") * 1.0))
            / (F.count("*") - 1.0)
        ).alias("v"),
    )
    return mom.select(
        "n",
        F.round("m", 6).alias("mean_k"),
        F.round("v", 6).alias("var_k"),
        F.round(F.col("v") / F.col("m"), 6).alias("overdispersion"),
        F.when(F.col("v") > F.col("m"), "overdispersed")
        .otherwise("underdispersed")
        .alias("dispersion_class"),
        F.round(
            F.when(F.col("v") > F.col("m"), F.col("m") * F.col("m") / (F.col("v") - F.col("m"))),
            6,
        ).alias("nb_r"),
        F.round(F.when(F.col("v") > F.col("m"), F.col("m") / F.col("v")), 6).alias("nb_p"),
    )
