"""Sixteenth oracle-registry module: language-model document scoring
and sequence statistics over the documents corpus — the remaining
text-analysis signals a training-data pipeline computes alongside
quality filtering (oracle_defs5) and drift monitoring (oracle_defs7).

  * lm_doc_score        — per-document mean log-probability under the
    corpus unigram LM (the G6 language model of SURVEY §2A applied as
    a fluency score: templated/boilerplate docs score high, noisy
    docs low). Corpus freq table is vocabulary-sized → Spark joins it
    broadcast; the per-doc agg is one keyed hash agg.
  * bigram_counts_docs  — corpus bigram table via posexplode +
    lead() window (the order-preserving sequence join a Markov LM /
    collocation miner needs); DuckDB twin uses generate_subscripts +
    the same window.
  * doc_repetition_ratio — per-document distinct-token ratio and
    top-token share (the repetition/boilerplate quality signal; a doc
    whose top token carries >30% of its mass is template noise).

All tokenization is the same built-in whitespace split used by the
textstats suite (oracle_defs4._SQL_TOKS) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_SQL_TOKS = r"""
    toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE doc_id < 300
    ),
    toks_ne AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0)
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _toks_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
        )
        .where(F.length("tok") > 0)
    )


# --- unigram-LM document fluency score -------------------------------------
@register(
    "lm_doc_score",
    f"""
    WITH {_SQL_TOKS},
    freq AS (SELECT tok, count(*) AS c FROM toks_ne GROUP BY tok),
    tot AS (SELECT sum(c) AS t FROM freq)
    SELECT d.doc_id,
           count(*) AS n_toks,
           round(avg(ln(f.c / tot.t)), 6) AS avg_logprob
    FROM toks_ne d
    JOIN freq f USING (tok)
    CROSS JOIN tot
    GROUP BY d.doc_id
    """,
)
def lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks_ne(spark, sf_dir)
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    # vocabulary-sized tables: broadcast both sides of the probe
    scored = toks.join(F.broadcast(freq), "tok").join(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_toks"),
        F.round(F.avg(F.log(F.col("c") / F.col("t"))), 6).alias("avg_logprob"),
    )


# --- corpus bigram counts (sequence-preserving) ----------------------------
@register(
    "bigram_counts_docs",
    f"""
    WITH lists AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l
      FROM documents WHERE doc_id < 300
    ),
    pos AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM lists
    ),
    pos_ne AS (SELECT * FROM pos WHERE len(tok) > 0),
    big AS (
      SELECT doc_id, tok AS tok1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2
      FROM pos_ne
    )
    SELECT tok1, tok2, count(*) AS cnt
    FROM big WHERE tok2 IS NOT NULL
    GROUP BY tok1, tok2
    HAVING count(*) >= 3
    """,
)
def bigram_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "tok"),
        )
        .where(F.length("tok") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = pos.select("doc_id", F.col("tok").alias("tok1"), F.lead("tok").over(w).alias("tok2"))
    return (
        big.where(F.col("tok2").isNotNull())
        .groupBy("tok1", "tok2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 3)
    )


# --- repetition / boilerplate signal ---------------------------------------
@register(
    "doc_repetition_ratio",
    f"""
    WITH {_SQL_TOKS},
    tf AS (SELECT doc_id, tok, count(*) AS c FROM toks_ne GROUP BY doc_id, tok)
    SELECT doc_id,
           cast(sum(c) AS BIGINT) AS n_toks,
           count(*) AS n_distinct,
           round(count(*) * 1.0 / sum(c), 6) AS distinct_ratio,
           round(max(c) * 1.0 / sum(c), 6) AS top_share
    FROM tf GROUP BY doc_id
    """,
)
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks_ne(spark, sf_dir)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_toks"),
        F.count("*").alias("n_distinct"),
        F.round(F.count("*") * F.lit(1.0) / F.sum("c"), 6).alias("distinct_ratio"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 6).alias("top_share"),
    )
