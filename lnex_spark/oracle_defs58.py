"""Fifty-eighth oracle-registry module: cross-validated evaluation,
experiment variance reduction, and isotonic calibration.

  * cv_auc_docs — 5-fold cross-validated ROC AUC of the n_chars
    score for lang='en': folds are md5-gated (content-hashed, like
    every split in this engine), each fold's AUC runs the same
    average-rank Mann-Whitney machinery as auc_nchars_en_docs but
    with all windows PARTITIONED BY fold, then mean and population
    std across folds.  The fold spread is the number a model report
    quotes next to the point estimate.

  * cuped_events — CUPED variance reduction for the event-level A/B
    readout: pre-period covariate x = each user's first-half-month
    mean value, metric y = second-half value; theta = cov(x,y)/var(x)
    from raw moments; emits variance of y and of the adjusted
    y − theta·(x − mean(x)) plus the reduction ratio.  The standard
    trick for shrinking experiment confidence intervals; two hash
    aggregates and a broadcast-sized covariate table.

  * isotonic_calibration_docs — isotonic (PAV) calibration of the
    decile reliability bins via the MINIMAX formula
    fitted(i) = max_{j<=i} min_{k>=i} weighted_avg(y[j..k]):
    on the 10-row bin table the O(bins²) segment enumeration is a
    self-join over prefix sums — fully relational on BOTH engines,
    no sequential pooling loop.  Completes the calibration suite:
    measure (calibration_bins), summarize (ece), fix (this op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs51 import _CALIB_SQL
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CV_AUC_SQL = """
    WITH scored AS (
      SELECT CAST(('0x' || substr(md5('cv-v1#' || CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 5 AS fold,
             n_chars AS score,
             CAST(lang = 'en' AS INTEGER) AS pos
      FROM documents
    ),
    per_score AS (
      SELECT fold, score,
             SUM(pos) AS n_pos,
             COUNT(*) - SUM(pos) AS n_neg,
             COUNT(*) AS cnt
      FROM scored GROUP BY fold, score
    ),
    ranked AS (
      SELECT fold, score, n_pos, n_neg, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY fold ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM per_score
    ),
    fold_auc AS (
      SELECT fold,
             (SUM(n_pos * (below + (cnt + 1) / 2.0))
              - SUM(n_pos) * (SUM(n_pos) + 1) / 2.0)
             / (SUM(n_pos) * SUM(n_neg)) AS auc
      FROM ranked GROUP BY fold
    )
    SELECT COUNT(*) AS n_folds,
           ROUND(AVG(auc), 6) AS mean_auc,
           ROUND(sqrt(AVG(auc * auc) - AVG(auc) * AVG(auc)), 6) AS std_auc,
           ROUND(MIN(auc), 6) AS min_auc,
           ROUND(MAX(auc), 6) AS max_auc
    FROM fold_auc
"""


@register("cv_auc_docs", _CV_AUC_SQL)
def cv_auc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("cv-v1#"), F.col("doc_id").cast("string"))), 1, 4),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("fold"),
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    )
    per_score = scored.groupBy("fold", "score").agg(
        F.sum("pos").alias("n_pos"),
        (F.count("*") - F.sum("pos")).alias("n_neg"),
        F.count("*").alias("cnt"),
    )
    w = Window.partitionBy("fold").orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    fold_auc = ranked.groupBy("fold").agg(
        (
            (
                F.sum(F.col("n_pos") * (F.col("below") + (F.col("cnt") + 1) / 2.0))
                - F.sum("n_pos") * (F.sum("n_pos") + 1) / 2.0
            )
            / (F.sum("n_pos") * F.sum("n_neg"))
        ).alias("auc")
    )
    return fold_auc.agg(
        F.count("*").alias("n_folds"),
        F.round(F.avg("auc"), 6).alias("mean_auc"),
        F.round(
            F.sqrt(F.avg(F.col("auc") * F.col("auc")) - F.avg("auc") * F.avg("auc")), 6
        ).alias("std_auc"),
        F.round(F.min("auc"), 6).alias("min_auc"),
        F.round(F.max("auc"), 6).alias("max_auc"),
    )


_CUPED_SQL = """
    WITH split AS (
      SELECT user_id, value,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS period
      FROM events
    ),
    pre AS (
      SELECT user_id, AVG(value) AS x FROM split WHERE period = 0 GROUP BY user_id
    ),
    post AS (
      SELECT s.user_id, s.value AS y, p.x
      FROM split s JOIN pre p ON s.user_id = p.user_id
      WHERE s.period = 1
    ),
    mom AS (
      SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             AVG(x * y) AS mxy, AVG(x * x) AS mxx, AVG(y * y) AS myy
      FROM post
    ),
    theta AS (
      SELECT n, mx, my, myy,
             (mxy - mx * my) / (mxx - mx * mx) AS th,
             myy - my * my AS var_y,
             (mxy - mx * my) * (mxy - mx * my) / (mxx - mx * mx) AS explained
      FROM mom
    )
    SELECT n,
           ROUND(th, 6) AS theta,
           ROUND(var_y, 6) AS var_y,
           ROUND(var_y - explained, 6) AS var_cuped,
           ROUND((var_y - explained) / var_y, 6) AS var_ratio
    FROM theta
"""


@register("cuped_events", _CUPED_SQL)
def cuped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var(y − θ(x−mean x)) = var(y) − cov²/var(x) in closed form, so
    the adjusted variance needs no second pass over the joined data."""
    ev = _t(spark, sf_dir, "events")
    split = ev.select(
        "user_id",
        "value",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("period"),
    )
    pre = split.filter(F.col("period") == 0).groupBy("user_id").agg(F.avg("value").alias("x"))
    post = (
        split.filter(F.col("period") == 1)
        .join(pre, "user_id")
        .select(F.col("value").alias("y"), "x")
    )
    mom = post.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    th = (F.col("mxy") - F.col("mx") * F.col("my")) / (F.col("mxx") - F.col("mx") * F.col("mx"))
    var_y = F.col("myy") - F.col("my") * F.col("my")
    explained = (
        (F.col("mxy") - F.col("mx") * F.col("my"))
        * (F.col("mxy") - F.col("mx") * F.col("my"))
        / (F.col("mxx") - F.col("mx") * F.col("mx"))
    )
    return mom.select(
        "n",
        F.round(th, 6).alias("theta"),
        F.round(var_y, 6).alias("var_y"),
        F.round(var_y - explained, 6).alias("var_cuped"),
        F.round((var_y - explained) / var_y, 6).alias("var_ratio"),
    )


_ISO_SQL = f"""
    WITH bins AS ({_CALIB_SQL}),
    b AS (
      SELECT bin, n, pos_rate,
             SUM(n * pos_rate) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cps,
             SUM(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cns
      FROM bins
    ),
    segs AS (
      SELECT j.bin AS j, k.bin AS k,
             (k.cps - j.cps + j.n * j.pos_rate) / (k.cns - j.cns + j.n) AS seg_avg
      FROM b j JOIN b k ON j.bin <= k.bin
    ),
    fitted AS (
      SELECT i.bin, i.n, i.pos_rate,
             MAX(inner_min.mn) AS fit
      FROM b i JOIN (
        SELECT s.j, i2.bin AS i, MIN(s.seg_avg) AS mn
        FROM segs s JOIN b i2 ON s.j <= i2.bin AND s.k >= i2.bin
        GROUP BY s.j, i2.bin
      ) inner_min ON inner_min.i = i.bin AND inner_min.j <= i.bin
      GROUP BY i.bin, i.n, i.pos_rate
    )
    SELECT bin, n, ROUND(pos_rate, 6) AS pos_rate, ROUND(fit, 6) AS iso_fit
    FROM fitted
"""


@register("isotonic_calibration_docs", _ISO_SQL)
def isotonic_calibration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs51 import calibration_bins_docs

    bins = calibration_bins_docs(spark, sf_dir).select("bin", "n", "pos_rate")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    b = bins.select(
        "bin",
        "n",
        "pos_rate",
        F.sum(F.col("n") * F.col("pos_rate")).over(w).alias("cps"),
        F.sum("n").over(w).alias("cns"),
    )
    j = b.select(
        F.col("bin").alias("j"),
        F.col("cps").alias("jcps"),
        F.col("cns").alias("jcns"),
        (F.col("n") * F.col("pos_rate")).alias("jw"),
        F.col("n").alias("jn"),
    )
    k = b.select(F.col("bin").alias("k"), F.col("cps").alias("kcps"), F.col("cns").alias("kcns"))
    segs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("kcps") - F.col("jcps") + F.col("jw"))
            / (F.col("kcns") - F.col("jcns") + F.col("jn"))
        ).alias("seg_avg"),
    )
    i2 = b.select(F.col("bin").alias("i"))
    inner_min = (
        segs.join(i2, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("j", "i")
        .agg(F.min("seg_avg").alias("mn"))
    )
    fitted = (
        b.join(inner_min, (F.col("i") == F.col("bin")) & (F.col("j") <= F.col("bin")))
        .groupBy("bin", "n", "pos_rate")
        .agg(F.max("mn").alias("fit"))
    )
    return fitted.select(
        "bin",
        "n",
        F.round("pos_rate", 6).alias("pos_rate"),
        F.round("fit", 6).alias("iso_fit"),
    )
