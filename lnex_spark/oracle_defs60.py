"""Sixtieth oracle-registry module: continuous-metric testing and
classic ML featurization.

  * welch_ttest_events — Welch's unequal-variance t-test on the
    value metric between the same md5 event arms as ab_test_events
    (the continuous-metric companion to its two-proportion z):
    per-arm raw moments → t statistic and Welch-Satterthwaite
    degrees of freedom, all closed-form.

  * feature_hashing_docs — the hashing trick: tokens hashed into 32
    signed buckets (md5-derived bucket and ±1 sign, the standard
    collision-bias cancellation), emitting the sparse (doc, bucket,
    weight) feature triples for the first documents.  The
    fixed-width featurizer that makes vocabulary size irrelevant at
    100 TB — no vocabulary pass, no dictionary broadcast, shuffle
    bounded by docs×buckets.

  * target_encoding_docs — leave-one-out target encoding of the
    source-prefix category against the lang='en' label:
    enc_i = (sum_y(cat) − y_i) / (n(cat) − 1) — the LOO form that
    prevents the row's own label from leaking into its feature.
    One category aggregate joined back; singleton categories get
    the global prior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_WELCH_SQL = """
    WITH arms AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events
    ),
    mom AS (
      SELECT arm, COUNT(*) AS n, AVG(value) AS m,
             (SUM(value * value) - COUNT(*) * AVG(value) * AVG(value)) / (COUNT(*) - 1.0) AS s2
      FROM arms GROUP BY arm
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
             MAX(CASE WHEN arm = 'A' THEN m END) AS ma,
             MAX(CASE WHEN arm = 'A' THEN s2 END) AS sa2,
             MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
             MAX(CASE WHEN arm = 'B' THEN m END) AS mb,
             MAX(CASE WHEN arm = 'B' THEN s2 END) AS sb2
      FROM mom
    )
    SELECT na, nb,
           ROUND(ma, 6) AS mean_a,
           ROUND(mb, 6) AS mean_b,
           ROUND((ma - mb) / sqrt(sa2 / na + sb2 / nb), 6) AS t_stat,
           ROUND(pow(sa2 / na + sb2 / nb, 2)
                 / (pow(sa2 / na, 2) / (na - 1.0) + pow(sb2 / nb, 2) / (nb - 1.0)), 6) AS df
    FROM wide
"""


@register("welch_ttest_events", _WELCH_SQL)
def welch_ttest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    arms = ev.select(
        F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            "A",
        ).otherwise("B").alias("arm"),
        "value",
    )
    mom = arms.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        (
            (F.sum(F.col("value") * F.col("value")) - F.count("*") * F.avg("value") * F.avg("value"))
            / (F.count("*") - 1.0)
        ).alias("s2"),
    )
    wide = mom.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("m"))).alias("ma"),
        F.max(F.when(F.col("arm") == "A", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("m"))).alias("mb"),
        F.max(F.when(F.col("arm") == "B", F.col("s2"))).alias("sb2"),
    )
    se2 = F.col("sa2") / F.col("na") + F.col("sb2") / F.col("nb")
    return wide.select(
        "na",
        "nb",
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("sa2") / F.col("na"), 2) / (F.col("na") - 1.0)
                + F.pow(F.col("sb2") / F.col("nb"), 2) / (F.col("nb") - 1.0)
            ),
            6,
        ).alias("df"),
    )


_FHASH_SQL = r"""
    WITH toks AS (
      SELECT doc_id, t AS tok
      FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
            FROM documents WHERE doc_id < 100)
      WHERE len(t) > 0
    ),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('fh-b#' || tok), 1, 4)) AS INTEGER) % 32 AS bucket,
             CASE WHEN CAST(('0x' || substr(md5('fh-s#' || tok), 1, 4)) AS INTEGER) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    )
    SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, bucket
    HAVING SUM(sgn) <> 0
"""


@register("feature_hashing_docs", _FHASH_SQL)
def feature_hashing_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
    )

    def h(salt: str, mod: int):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("tok"))), 1, 4), 16, 10)
            .cast("long")
            % mod
        )

    hashed = toks.select(
        "doc_id",
        h("fh-b#", 32).alias("bucket"),
        F.when(h("fh-s#", 2) == 0, 1).otherwise(-1).alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


_TENC_SQL = """
    WITH labeled AS (
      SELECT doc_id,
             substr(source, 1, 4) AS cat,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    stats AS (
      SELECT cat, COUNT(*) AS n_cat, SUM(y) AS sum_y FROM labeled GROUP BY cat
    ),
    prior AS (SELECT AVG(y * 1.0) AS p FROM labeled)
    SELECT l.doc_id, l.cat, l.y,
           ROUND(CASE WHEN s.n_cat > 1
                      THEN (s.sum_y - l.y) * 1.0 / (s.n_cat - 1)
                      ELSE (SELECT p FROM prior) END, 6) AS loo_enc
    FROM labeled l JOIN stats s ON l.cat = s.cat
    WHERE l.doc_id < 50
"""


@register("target_encoding_docs", _TENC_SQL)
def target_encoding_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    labeled = d.select(
        "doc_id",
        F.substring("source", 1, 4).alias("cat"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    stats = labeled.groupBy("cat").agg(F.count("*").alias("n_cat"), F.sum("y").alias("sum_y"))
    prior = labeled.agg(F.avg(F.col("y") * 1.0).alias("p"))
    return (
        labeled.join(stats, "cat")
        .crossJoin(prior)
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            "cat",
            "y",
            F.round(
                F.when(
                    F.col("n_cat") > 1,
                    (F.col("sum_y") - F.col("y")) * 1.0 / (F.col("n_cat") - 1),
                ).otherwise(F.col("p")),
                6,
            ).alias("loo_enc"),
        )
    )
