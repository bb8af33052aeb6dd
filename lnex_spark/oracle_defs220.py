"""Two-hundred-twentieth oracle-registry module: lexical dispersion —
does a word's frequency come from everywhere or from a few hotspot
documents?  The corpus-linguistics complement to term_burstiness,
computed per word over the 20-source partition.

  * dispersion_docs — for the 20 globally most frequent tokens
    (rank ties broken by token), two classical dispersion indices
    across sources: Gries' DP = sum |share of the word's tokens in
    source s - source s's share of the corpus| / 2 (0 = perfectly
    proportional spread, → 1 = concentrated in one source), and
    Juilland's D = 1 - CV/sqrt(k - 1) over the per-source
    normalized rates.  Words with high frequency but high DP are
    topic/template artifacts, not general vocabulary — exactly the
    distinction a stopword or keyword list built from raw frequency
    gets wrong.

  * range_coverage_docs — the blunt-but-robust third axis: for the
    same 20 words, document frequency (share of DOCUMENTS containing
    the word) and source range (number of the 20 sources where it
    appears at all), plus the frequency-per-document ratio that
    separates "appears everywhere once" from "appears rarely but in
    bursts" (cross-check: doc_repetition_ratio, term_burstiness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TOP = """
    toks AS (
      SELECT source, doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ),
    clean AS (SELECT source, doc_id, tok FROM toks WHERE tok <> ''),
    topw AS (
      SELECT tok FROM clean GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT 20
    )
"""


_DISP_SQL = f"""
    WITH {_TOP},
    src_tot AS (SELECT source, COUNT(*) AS nt FROM clean GROUP BY source),
    corpus AS (SELECT SUM(nt) AS ct, COUNT(*) AS k FROM src_tot),
    wcnt AS (
      SELECT c.tok, c.source, COUNT(*) AS w
      FROM clean c JOIN topw t ON t.tok = c.tok
      GROUP BY c.tok, c.source
    ),
    wtot AS (SELECT tok, SUM(w) AS wt FROM wcnt GROUP BY tok),
    dense AS (
      SELECT t.tok, s.source, s.nt, COALESCE(w.w, 0) AS w
      FROM topw t CROSS JOIN src_tot s
      LEFT JOIN wcnt w ON w.tok = t.tok AND w.source = s.source
    ),
    rates AS (
      SELECT d.tok, d.source,
             CAST(d.w AS DOUBLE) / wt.wt AS obs_share,
             CAST(d.nt AS DOUBLE) / (SELECT ct FROM corpus) AS exp_share,
             CAST(d.w AS DOUBLE) / d.nt AS rate
      FROM dense d JOIN wtot wt ON wt.tok = d.tok
    )
    SELECT tok AS term,
           ROUND(SUM(ABS(obs_share - exp_share)) / 2, 6) AS gries_dp,
           ROUND(1 - (SQRT(AVG(rate * rate) - AVG(rate) * AVG(rate))
                      / AVG(rate))
                     / SQRT((SELECT k FROM corpus) - 1.0), 6) AS juilland_d
    FROM rates
    GROUP BY tok
    ORDER BY term
"""


@register("dispersion_docs", _DISP_SQL)
def dispersion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    topw = (
        clean.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(20)
        .select("tok")
    )
    src_tot = clean.groupBy("source").agg(F.count("*").alias("nt"))
    corpus = src_tot.agg(F.sum("nt").alias("ct"), F.count("*").alias("k"))
    wcnt = (
        clean.join(F.broadcast(topw), "tok")
        .groupBy("tok", "source")
        .agg(F.count("*").alias("w"))
    )
    wtot = wcnt.groupBy("tok").agg(F.sum("w").alias("wt"))
    dense = (
        F.broadcast(topw)
        .crossJoin(src_tot)
        .join(wcnt, ["tok", "source"], "left")
        .na.fill({"w": 0})
    )
    rates = (
        dense.join(F.broadcast(wtot), "tok")
        .crossJoin(F.broadcast(corpus))
        .select(
            "tok",
            "k",
            (F.col("w").cast("double") / F.col("wt")).alias("obs_share"),
            (F.col("nt").cast("double") / F.col("ct")).alias("exp_share"),
            (F.col("w").cast("double") / F.col("nt")).alias("rate"),
        )
    )
    cv = (
        F.sqrt(
            F.avg(F.col("rate") * F.col("rate")) - F.avg("rate") * F.avg("rate")
        )
        / F.avg("rate")
    )
    return (
        rates.groupBy("tok")
        .agg(
            F.round(
                F.sum(F.abs(F.col("obs_share") - F.col("exp_share"))) / 2, 6
            ).alias("gries_dp"),
            F.round(
                1 - cv / F.sqrt(F.max("k") - 1.0), 6
            ).alias("juilland_d"),
        )
        .select(F.col("tok").alias("term"), "gries_dp", "juilland_d")
        .orderBy("term")
    )


_RANGE_SQL = f"""
    WITH {_TOP},
    ndocs AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM clean),
    per_word AS (
      SELECT c.tok,
             COUNT(*) AS freq,
             COUNT(DISTINCT c.doc_id) AS df,
             COUNT(DISTINCT c.source) AS src_range
      FROM clean c JOIN topw t ON t.tok = c.tok
      GROUP BY c.tok
    )
    SELECT tok AS term,
           CAST(freq AS BIGINT) AS freq,
           CAST(df AS BIGINT) AS doc_freq,
           ROUND(CAST(df AS DOUBLE) / (SELECT nd FROM ndocs), 6)
             AS doc_coverage,
           CAST(src_range AS BIGINT) AS source_range,
           ROUND(CAST(freq AS DOUBLE) / df, 6) AS freq_per_doc
    FROM per_word
    ORDER BY term
"""


@register("range_coverage_docs", _RANGE_SQL)
def range_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    topw = (
        clean.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(20)
        .select("tok")
    )
    nd = clean.select("doc_id").distinct().count()
    per_word = (
        clean.join(F.broadcast(topw), "tok")
        .groupBy("tok")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("df"),
            F.countDistinct("source").alias("src_range"),
        )
    )
    return per_word.select(
        F.col("tok").alias("term"),
        F.col("freq").cast("long").alias("freq"),
        F.col("df").cast("long").alias("doc_freq"),
        F.round(F.col("df").cast("double") / F.lit(nd), 6).alias(
            "doc_coverage"
        ),
        F.col("src_range").cast("long").alias("source_range"),
        F.round(F.col("freq").cast("double") / F.col("df"), 6).alias(
            "freq_per_doc"
        ),
    ).orderBy("term")
