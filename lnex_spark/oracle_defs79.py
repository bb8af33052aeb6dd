"""Seventy-ninth oracle-registry module: design-based estimation and
lead-lag diagnostics.

  * horvitz_thompson_docs — the Horvitz-Thompson estimator over the
    already-verified deterministic stratified sample
    (stratified_sample_docs gates: md5 bucket < 32768/13107/6554 of
    65536 per language): per-language corpus totals (docs, chars)
    estimated from the sample alone by inverse-inclusion-probability
    weighting, reported against the true totals with relative
    errors.  The arithmetic is exact-deterministic by construction:
    integer sample sums divided ONCE by the rational pi, never
    per-row double accumulation — the estimate a sampling pipeline
    publishes when scanning the full corpus is too expensive.

  * cross_corr_events — lagged cross-correlation between the daily
    click-count and error-count series at lags -3..+3: Pearson in
    raw-moment form over the inner join of day with day+lag, plus a
    best-lag flag (argmax over corr ROUNDED first, ties to the
    smaller lag, so the argmax is cross-engine exact).  The lead-lag
    diagnostic behind "do errors follow clicks?" — one tiny join
    per lag over the day-aggregated series, never over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HT_SQL = """
    WITH gated AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5('strat-v1#' || CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) AS bucket,
             CASE lang WHEN 'en' THEN 32768 WHEN 'de' THEN 13107 ELSE 6554 END AS thr
      FROM documents
    ),
    sampled AS (
      SELECT lang, COUNT(*) AS s_docs, SUM(n_chars) AS s_chars,
             MIN(thr) AS thr
      FROM gated WHERE bucket < thr GROUP BY lang
    ),
    truth AS (
      SELECT lang, COUNT(*) AS true_docs, SUM(n_chars) AS true_chars
      FROM documents GROUP BY lang
    )
    SELECT t.lang, t.true_docs, t.true_chars,
           ROUND(s.s_docs * 65536.0 / s.thr, 6) AS est_docs,
           ROUND(s.s_chars * 65536.0 / s.thr, 6) AS est_chars,
           ROUND(s.s_docs * 65536.0 / s.thr / t.true_docs - 1.0, 6) AS docs_rel_err,
           ROUND(s.s_chars * 65536.0 / s.thr / t.true_chars - 1.0, 6) AS chars_rel_err
    FROM truth t JOIN sampled s ON t.lang = s.lang
"""


@register("horvitz_thompson_docs", _HT_SQL)
def horvitz_thompson_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    from lnex_spark.operators.curation import hash_bucket

    thr = (
        F.when(F.col("lang") == "en", 32768)
        .when(F.col("lang") == "de", 13107)
        .otherwise(6554)
    )
    gated = d.select(
        "lang", "n_chars", hash_bucket(F.col("doc_id"), "strat-v1").alias("bucket"), thr.alias("thr")
    )
    sampled = (
        gated.filter(F.col("bucket") < F.col("thr"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("s_docs"),
            F.sum("n_chars").alias("s_chars"),
            F.min("thr").alias("thr"),
        )
    )
    truth = d.groupBy("lang").agg(
        F.count("*").alias("true_docs"), F.sum("n_chars").alias("true_chars")
    )
    est_docs = F.col("s_docs") * 65536.0 / F.col("thr")
    est_chars = F.col("s_chars") * 65536.0 / F.col("thr")
    return truth.join(sampled, "lang").select(
        "lang",
        "true_docs",
        "true_chars",
        F.round(est_docs, 6).alias("est_docs"),
        F.round(est_chars, 6).alias("est_chars"),
        F.round(est_docs / F.col("true_docs") - 1.0, 6).alias("docs_rel_err"),
        F.round(est_chars / F.col("true_chars") - 1.0, 6).alias("chars_rel_err"),
    )


_XC_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE)
    ),
    lagged AS (
      SELECT l.lag, a.x, b.y
      FROM (SELECT unnest(range(-3, 4)) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
    ),
    corrs AS (
      SELECT lag, COUNT(*) AS n_days,
             ROUND(
               (AVG(x * y * 1.0) - AVG(x * 1.0) * AVG(y * 1.0))
               / sqrt((AVG(x * x * 1.0) - AVG(x * 1.0) * AVG(x * 1.0))
                      * (AVG(y * y * 1.0) - AVG(y * 1.0) * AVG(y * 1.0))), 6)
               AS xcorr
      FROM lagged GROUP BY lag
    )
    SELECT lag, n_days, xcorr,
           CAST(row_number() OVER (ORDER BY xcorr DESC, lag) = 1 AS INTEGER) AS is_best
    FROM corrs
"""


@register("cross_corr_events", _XC_SQL)
def cross_corr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("y"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("xday"), "x")
    b = daily.select(F.col("day").alias("yday"), "y")
    lagged = (
        lags.crossJoin(a)
        .join(b, F.col("yday") == F.date_add(F.col("xday"), F.col("lag")))
        .select("lag", "x", "y")
    )

    def dbl(c):
        return F.col(c).cast("double")

    corrs = lagged.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.round(
            (F.avg(dbl("x") * dbl("y")) - F.avg(dbl("x")) * F.avg(dbl("y")))
            / F.sqrt(
                (F.avg(dbl("x") * dbl("x")) - F.avg(dbl("x")) * F.avg(dbl("x")))
                * (F.avg(dbl("y") * dbl("y")) - F.avg(dbl("y")) * F.avg(dbl("y")))
            ),
            6,
        ).alias("xcorr"),
    )
    # the window runs over the 7 lag rows only
    return corrs.select(
        "lag",
        "n_days",
        "xcorr",
        (F.row_number().over(Window.orderBy(F.desc("xcorr"), F.asc("lag"))) == 1)
        .cast("int")
        .alias("is_best"),
    )
