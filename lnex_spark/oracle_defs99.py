"""Ninety-ninth oracle-registry module: vocabulary growth law and a
churn baseline model.

  * heaps_law_docs — Heaps' law fit V(n) = K·n^β for bigram
    vocabulary growth: cumulative distinct bigrams at each doc_id
    decile checkpoint via the first-occurrence trick (min doc_id per
    bigram — no ordered scan over the corpus), cumulative token mass
    from integer counts, then the log-log least-squares slope β and
    intercept ln K across checkpoints.  The growth-law companion to
    zipf_slope_docs: together they say how vocabulary scales with
    another 100× of corpus — the number tokenizer-capacity planning
    actually uses.  Bigram vocabulary because the unigram set is
    closed (31 types) here.

  * churn_stump_users — the one-feature churn baseline: label =
    "no events in the last week", feature = event count in the
    first three weeks, best decision stump over the observed count
    thresholds (accuracy argmax on rounded values, threshold
    tiebreak).  The sanity baseline every churn model must beat;
    the stump machinery of stump_threshold_docs pointed at a
    longitudinal label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HEAPS_SQL = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id < 2000
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
    ),
    bg AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS b FROM pos),
    firsts AS (SELECT b, MIN(doc_id) AS first_doc FROM bg GROUP BY b),
    maxd AS (SELECT MAX(doc_id) AS mx FROM bg),
    checkpoints AS (
      -- bound_g = largest doc_id whose decile (floor(x*10/(mx+1))) is <= g,
      -- i.e. ((g+1)(mx+1)-1) // 10 — must match the Spark decile bucketing
      SELECT ((g + 1) * (mx + 1) - 1) // 10 AS bound
      FROM (SELECT unnest(range(0, 10)) AS g), maxd
    ),
    curve AS (
      SELECT c.bound,
             (SELECT COUNT(*) FROM bg WHERE bg.doc_id <= c.bound) AS n_toks,
             (SELECT COUNT(*) FROM firsts f WHERE f.first_doc <= c.bound) AS v
      FROM checkpoints c
    ),
    logs AS (
      SELECT ln(n_toks * 1.0) AS x, ln(v * 1.0) AS y FROM curve WHERE n_toks > 0
    )
    SELECT COUNT(*) AS n_checkpoints,
           ROUND((AVG(x * y) - AVG(x) * AVG(y))
                 / (AVG(x * x) - AVG(x) * AVG(x)), 6) AS heaps_beta,
           ROUND(AVG(y) - (AVG(x * y) - AVG(x) * AVG(y))
                 / (AVG(x * x) - AVG(x) * AVG(x)) * AVG(x), 6) AS heaps_lnk
    FROM logs
"""


@register("heaps_law_docs", _HEAPS_SQL)
def heaps_law_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
    ).select("doc_id", F.array_join(F.slice("t", F.col("i"), 2), " ").alias("b"))
    firsts = bg.groupBy("b").agg(F.min("doc_id").alias("first_doc"))
    maxd = bg.agg(F.max("doc_id").alias("mx"))
    # decile-bucket the per-doc masses once, then running-sum the 10
    # buckets — no correlated per-checkpoint rescans
    tok_curve = (
        bg.crossJoin(maxd)
        .groupBy(F.least(F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)), F.lit(9)).alias("dec"))
        .agg(F.count("*").alias("c"))
    )
    first_curve = (
        firsts.crossJoin(maxd)
        .groupBy(
            F.least(F.floor(F.col("first_doc") * 10 / (F.col("mx") + 1)), F.lit(9)).alias("dec")
        )
        .agg(F.count("*").alias("c"))
    )
    spine = spark.range(0, 10).select(F.col("id").alias("dec"))
    joined = (
        spine.join(tok_curve.select("dec", F.col("c").alias("tc")), "dec", "left")
        .join(first_curve.select(F.col("dec").alias("fdec"), F.col("c").alias("fc")),
              spine["dec"] == F.col("fdec"), "left")
        .select(
            "dec",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("fc"), F.lit(0)).alias("fc"),
        )
    )
    wcum = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    curve = joined.select(
        F.sum("tc").over(wcum).alias("n_toks"), F.sum("fc").over(wcum).alias("v")
    )
    logs = curve.filter(F.col("n_toks") > 0).select(
        F.log(F.col("n_toks") * 1.0).alias("x"), F.log(F.col("v") * 1.0).alias("y")
    )
    slope = (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")) / (
        F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
    )
    return logs.agg(
        F.count("*").alias("n_checkpoints"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("heaps_lnk"),
    )


_CHURN_SQL = """
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-22' THEN 1 ELSE 0 END) AS n_early,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22' THEN 1 ELSE 0 END) AS n_late
      FROM events GROUP BY user_id
    ),
    labeled AS (
      SELECT user_id, n_early,
             CASE WHEN n_late = 0 THEN 1 ELSE 0 END AS churned
      FROM per_user
    ),
    grid AS (SELECT DISTINCT n_early AS thr FROM labeled),
    evals AS (
      SELECT g.thr,
             SUM(CASE WHEN (l.n_early < g.thr) = (l.churned = 1) THEN 1 ELSE 0 END)
               AS correct,
             COUNT(*) AS n
      FROM grid g, labeled l GROUP BY g.thr
    ),
    scored AS (
      SELECT thr, CAST(correct AS BIGINT) AS correct, CAST(n AS BIGINT) AS n_users,
             ROUND(correct * 1.0 / n, 6) AS accuracy
      FROM evals
    )
    SELECT thr, correct, n_users, accuracy,
           CAST(row_number() OVER (ORDER BY accuracy DESC, thr) = 1 AS INTEGER)
             AS is_best
    FROM scored
"""


@register("churn_stump_users", _CHURN_SQL)
def churn_stump_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-22").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("n_late"),
    )
    labeled = per_user.select(
        "n_early", F.when(F.col("n_late") == 0, 1).otherwise(0).alias("churned")
    )
    grid = labeled.select(F.col("n_early").alias("thr")).distinct()
    evals = grid.crossJoin(labeled).groupBy("thr").agg(
        F.sum(
            F.when(
                (F.col("n_early") < F.col("thr")) == (F.col("churned") == 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("correct"),
        F.count("*").cast("long").alias("n_users"),
    )
    scored = evals.select(
        "thr",
        "correct",
        "n_users",
        F.round(F.col("correct") * 1.0 / F.col("n_users"), 6).alias("accuracy"),
    )
    # candidate-threshold-sized global window
    w = Window.orderBy(F.desc("accuracy"), F.asc("thr"))
    return scored.select(
        "thr", "correct", "n_users", "accuracy",
        (F.row_number().over(w) == 1).cast("int").alias("is_best"),
    )
