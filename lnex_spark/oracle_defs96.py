"""Ninety-sixth oracle-registry module: balanced operating-point
selection and directed-graph dyads.

  * mcc_threshold_docs — Matthews-correlation operating-point
    selection for the deterministic logistic quality score
    (sigmoid((n_chars-400)/150) vs lang='en', the same score the
    calibration/ECE/F1 ops use): confusion counts per threshold in
    {0.1 … 0.9}, MCC from exact integers, best row flagged via
    rounded-argmax (threshold tiebreak).  MCC stays honest under
    class imbalance where accuracy and F1 mislead — this completes
    the operating-point family (F1, info-gain, MCC).

  * reciprocity_events — dyad census of the directed event-type
    transition graph (the SCC op's edge set): reciprocity = fraction
    of ordered edges whose reverse edge also occurs, plus mutual /
    asymmetric dyad counts.  The one-pass structural readout that
    says whether "A then B" implies "B then A" in user behavior;
    one self-join on the reversed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MCC_SQL = """
    WITH scored AS (
      SELECT 1.0 / (1.0 + exp(-(n_chars - 400) / 150.0)) AS p,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    grid AS (
      SELECT CAST(g AS DOUBLE) / 10.0 AS thr
      FROM (SELECT unnest(range(1, 10)) AS g)
    ),
    conf AS (
      SELECT g.thr,
             SUM(CASE WHEN s.p >= g.thr AND s.y = 1 THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN s.p >= g.thr AND s.y = 0 THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN s.p < g.thr AND s.y = 0 THEN 1 ELSE 0 END) AS tn,
             SUM(CASE WHEN s.p < g.thr AND s.y = 1 THEN 1 ELSE 0 END) AS fn
      FROM grid g, scored s GROUP BY g.thr
    ),
    mcc AS (
      SELECT thr, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
             ROUND((tp * tn - fp * fn) * 1.0
                   / NULLIF(sqrt((tp + fp) * 1.0) * sqrt((tp + fn) * 1.0)
                            * sqrt((tn + fp) * 1.0) * sqrt((tn + fn) * 1.0), 0), 6)
               AS mcc
      FROM conf
    )
    SELECT thr, tp, fp, tn, fn, mcc,
           CAST(row_number() OVER (ORDER BY mcc DESC, thr) = 1 AS INTEGER) AS is_best
    FROM mcc
"""


@register("mcc_threshold_docs", _MCC_SQL)
def mcc_threshold_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (1.0 / (1.0 + F.exp(-(F.col("n_chars") - 400) / 150.0))).alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    grid = spark.range(1, 10).select(
        (F.col("id").cast("double") / 10.0).alias("thr")
    )
    pred = F.col("p") >= F.col("thr")
    conf = grid.crossJoin(scored).groupBy("thr").agg(
        F.sum(F.when(pred & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(~pred & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("fn"),
    )
    denom = (
        F.sqrt((F.col("tp") + F.col("fp")) * 1.0)
        * F.sqrt((F.col("tp") + F.col("fn")) * 1.0)
        * F.sqrt((F.col("tn") + F.col("fp")) * 1.0)
        * F.sqrt((F.col("tn") + F.col("fn")) * 1.0)
    )
    mcc = conf.withColumn(
        "mcc",
        F.round(
            (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn"))
            * 1.0
            / F.nullif(denom, F.lit(0.0)),
            6,
        ),
    )
    # 9-row global window
    w = Window.orderBy(F.desc("mcc"), F.asc("thr"))
    return mcc.select(
        "thr", "tp", "fp", "tn", "fn", "mcc",
        (F.row_number().over(w) == 1).cast("int").alias("is_best"),
    )


_RECIP_SQL = """
    WITH ordered AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ),
    edges AS (
      SELECT DISTINCT a, b FROM ordered WHERE b IS NOT NULL AND b <> a
    ),
    marked AS (
      SELECT e.a, e.b,
             CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END AS has_reverse
      FROM edges e
      LEFT JOIN edges r ON r.a = e.b AND r.b = e.a
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(has_reverse) AS BIGINT) AS n_reciprocated,
           CAST(SUM(has_reverse) / 2 AS BIGINT) AS n_mutual_dyads,
           CAST(COUNT(*) - SUM(has_reverse) AS BIGINT) AS n_asym_dyads,
           ROUND(SUM(has_reverse) * 1.0 / COUNT(*), 6) AS reciprocity
    FROM marked
"""


@register("reciprocity_events", _RECIP_SQL)
def reciprocity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("a"), F.lead("event_type").over(w).alias("b")
    )
    edges = (
        ordered.filter(F.col("b").isNotNull() & (F.col("b") != F.col("a")))
        .select("a", "b")
        .distinct()
    )
    rev = edges.select(F.col("b").alias("ra"), F.col("a").alias("rb"))
    marked = edges.join(
        rev, (edges["b"] == rev["ra"]) & (edges["a"] == rev["rb"]), "left"
    ).select(
        "a", "b", F.when(F.col("ra").isNotNull(), 1).otherwise(0).alias("has_reverse")
    )
    return marked.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("has_reverse").cast("long").alias("n_reciprocated"),
        (F.sum("has_reverse") / 2).cast("long").alias("n_mutual_dyads"),
        (F.count("*") - F.sum("has_reverse")).cast("long").alias("n_asym_dyads"),
        F.round(F.sum("has_reverse") * 1.0 / F.count("*"), 6).alias("reciprocity"),
    )
