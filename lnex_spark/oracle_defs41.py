"""Forty-first oracle-registry module: run-length encoding and
vocabulary overlap.

  * rle_runs_events — run-length encoding of each user's event-type
    stream: the islands machinery emitting the RUNS themselves
    (run index, state, length) rather than a rollup — the compressed
    sequence representation behind burst analysis and
    repeated-action collapsing.
  * vocab_overlap_docs — vocabulary overlap between the English and
    German sub-corpora: type-level Jaccard plus the occurrence-level
    OOV rate of German under the English vocabulary — the
    domain-shift diagnostic run before reusing a tokenizer or LM
    across corpora (pairs with vocab_coverage and
    lexical_diversity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- run-length encoding of event-type streams -----------------------------
_RLE_SQL = """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id < 30
    ),
    isl AS (
      SELECT user_id, event_type,
             sum(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_idx
      FROM s
    )
    SELECT user_id, run_idx, event_type, count(*) AS run_len
    FROM isl GROUP BY user_id, run_idx, event_type
"""


@register("rle_runs_events", _RLE_SQL)
def rle_runs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    new_run = F.when(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
    ).otherwise(0)
    isl = s.select(
        "user_id", "event_type", F.sum(new_run).over(w_run).alias("run_idx")
    )
    return isl.groupBy("user_id", "run_idx", "event_type").agg(
        F.count("*").alias("run_len")
    )


# --- en/de vocabulary overlap ----------------------------------------------
_VOCAB_OVERLAP_SQL = r"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE lang IN ('en', 'de')
    ),
    toks_ne AS (SELECT lang, tok FROM toks WHERE len(tok) > 0),
    ven AS (SELECT DISTINCT tok FROM toks_ne WHERE lang = 'en'),
    vde AS (SELECT DISTINCT tok FROM toks_ne WHERE lang = 'de'),
    inter AS (SELECT count(*) AS i FROM ven WHERE tok IN (SELECT tok FROM vde)),
    oov AS (
      SELECT count(*) AS n_de_occ,
             sum(CASE WHEN tok NOT IN (SELECT tok FROM ven)
                      THEN 1 ELSE 0 END) AS n_oov
      FROM toks_ne WHERE lang = 'de'
    )
    SELECT (SELECT count(*) FROM ven) AS v_en,
           (SELECT count(*) FROM vde) AS v_de,
           inter.i AS v_common,
           round(inter.i * 1.0 / ((SELECT count(*) FROM ven)
                 + (SELECT count(*) FROM vde) - inter.i), 6) AS vocab_jaccard,
           oov.n_de_occ,
           round(oov.n_oov * 1.0 / oov.n_de_occ, 6) AS oov_rate
    FROM inter CROSS JOIN oov
"""


@register("vocab_overlap_docs", _VOCAB_OVERLAP_SQL)
def vocab_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .select(
            "lang", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
        )
        .filter(F.length("tok") > 0)
    )
    ven = toks.filter(F.col("lang") == "en").select("tok").distinct()
    vde = toks.filter(F.col("lang") == "de").select("tok").distinct()
    n_en = ven.agg(F.count("*").alias("v_en"))
    n_de = vde.agg(F.count("*").alias("v_de"))
    inter = ven.join(vde, "tok", "left_semi").agg(F.count("*").alias("v_common"))
    de_occ = toks.filter(F.col("lang") == "de")
    oov = (
        de_occ.join(ven.withColumnRenamed("tok", "seen"), de_occ["tok"] == F.col("seen"), "left")
        .agg(
            F.count("*").alias("n_de_occ"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        n_en.crossJoin(n_de)
        .crossJoin(inter)
        .crossJoin(oov)
        .select(
            "v_en",
            "v_de",
            "v_common",
            F.round(
                F.col("v_common")
                * 1.0
                / (F.col("v_en") + F.col("v_de") - F.col("v_common")),
                6,
            ).alias("vocab_jaccard"),
            "n_de_occ",
            F.round(F.col("n_oov") * 1.0 / F.col("n_de_occ"), 6).alias("oov_rate"),
        )
    )
