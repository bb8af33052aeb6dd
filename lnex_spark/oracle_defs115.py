"""Hundred-fifteenth oracle-registry module: unseen-species estimation
and mention-span geometry.

  * chao1_docs — the Chao1 richness estimator over the bigram
    vocabulary: V_observed + F1²/(2·F2) from the frequency-of-
    frequencies table (F1 = singletons, F2 = doubletons — the same
    count-of-counts Good-Turing smoothing reads), with the
    bias-corrected form when F2 = 0.  Answers "how many bigram types
    exist that this corpus has NOT yet seen" — the
    capture-recapture of vocabularies, and the principled version of
    the Heaps extrapolation.

  * kg_span_stats — the M3 offset contract as value-checked data,
    per surface form: mention counts plus a span_consistent flag
    where EACH side checks its own span semantics — the engine's
    Arrow matcher emits CHAR offsets (every mention of norm must
    span exactly len(norm) chars, normalization being
    length-preserving here), the DuckDB twin emits TOKEN spans
    (every mention of a k-token name spans k−1).  The value-hash
    match therefore proves BOTH offset contracts hold on the same
    mentions — a cross-semantics invariant, not a column-copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracle_defs2 import _SQL_TOKENIZE
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CHAO_SQL = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id < 2000
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
    ),
    bg AS (SELECT array_to_string(t[i:i+1], ' ') AS b FROM pos),
    cnt AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
    fof AS (
      SELECT COUNT(*) AS v_obs,
             SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
      FROM cnt
    )
    SELECT CAST(v_obs AS BIGINT) AS v_observed,
           CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
           ROUND(CASE WHEN f2 > 0 THEN v_obs + f1 * f1 / (2.0 * f2)
                      ELSE v_obs + f1 * (f1 - 1) / 2.0 END, 6) AS chao1,
           ROUND(CASE WHEN f2 > 0 THEN f1 * f1 / (2.0 * f2)
                      ELSE f1 * (f1 - 1) / 2.0 END, 6) AS est_unseen
    FROM fof
"""


@register("chao1_docs", _CHAO_SQL)
def chao1_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
    ).select(F.array_join(F.slice("t", F.col("i"), 2), " ").alias("b"))
    cnt = bg.groupBy("b").agg(F.count("*").alias("c"))
    fof = cnt.agg(
        F.count("*").alias("v_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    unseen = F.when(
        F.col("f2") > 0, F.col("f1") * F.col("f1") / (2.0 * F.col("f2"))
    ).otherwise(F.col("f1") * (F.col("f1") - 1) / 2.0)
    return fof.select(
        F.col("v_obs").cast("long").alias("v_observed"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(F.col("v_obs") + unseen, 6).alias("chao1"),
        F.round(unseen, 6).alias("est_unseen"),
    )


_SPAN_SQL = f"""
    WITH {_SQL_TOKENIZE}
    SELECT norm,
           CAST(length(norm) - length(replace(norm, ' ', '')) + 1 AS BIGINT)
             AS n_tokens,
           COUNT(*) AS n_mentions,
           CAST(MIN(e - s) = MAX(e - s)
                AND MIN(e - s) = length(norm) - length(replace(norm, ' ', ''))
                AS INTEGER) AS span_consistent
    FROM final GROUP BY norm
"""


@register("kg_span_stats", _SPAN_SQL)
def kg_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs2 import _oracle_mentions

    m = _oracle_mentions(spark, sf_dir)
    return (
        m.groupBy("norm")
        .agg(
            F.count("*").alias("n_mentions"),
            F.min(F.col("end") - F.col("start")).cast("long").alias("min_span"),
            F.max(F.col("end") - F.col("start")).cast("long").alias("max_span"),
        )
        .select(
            "norm",
            (
                F.length("norm")
                - F.length(F.replace(F.col("norm"), F.lit(" "), F.lit("")))
                + 1
            )
            .cast("long")
            .alias("n_tokens"),
            "n_mentions",
            # char-offset contract: every mention spans len(norm) chars
            (
                (F.col("min_span") == F.col("max_span"))
                & (F.col("min_span") == F.length("norm"))
            )
            .cast("int")
            .alias("span_consistent"),
        )
    )
