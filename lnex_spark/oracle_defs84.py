"""Eighty-fourth oracle-registry module: corpus novelty and bounded
distribution divergence.

  * ngram_novelty_docs — the novelty curve an ingest pipeline reads
    to see repetition accumulate: processing documents in doc_id
    order, each doc's novelty is the fraction of its distinct
    bigrams never seen in ANY earlier document.  First occurrence
    is one min(doc_id)-per-bigram aggregate (no ordered scan, no
    window over the corpus); reported bucketed by doc_id-percentile
    decile so the output stays fixed-size while the trend (novelty
    decays as the corpus grows) is visible.  The longitudinal
    complement of the pairwise dedup ops.

  * jsd_divergence_docs — Jensen-Shannon divergence between the en
    and de unigram distributions (base-2, so 0 ≤ JSD ≤ 1), from the
    same token counts as vocab_overlap_docs but measuring HOW
    differently the shared vocabulary is used rather than how much
    of it is shared.  Symmetric and bounded where KL is neither —
    the safe default for corpus-vs-corpus drift dashboards.  Exact
    rational probabilities from integer counts; the two engines
    evaluate the identical log formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NOVELTY_SQL = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id < 2000
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
    ),
    bg AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS b FROM pos),
    firsts AS (SELECT b, MIN(doc_id) AS first_doc FROM bg GROUP BY b),
    per_doc AS (
      SELECT g.doc_id,
             COUNT(*) AS n_bigrams,
             SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM bg g JOIN firsts f ON g.b = f.b
      GROUP BY g.doc_id
    ),
    maxd AS (SELECT MAX(doc_id) AS mx FROM per_doc)
    SELECT CAST(LEAST((doc_id * 10) // (mx + 1), 9) AS INTEGER) AS decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           ROUND(SUM(n_novel) * 1.0 / SUM(n_bigrams), 6) AS novelty_rate
    FROM per_doc, maxd
    GROUP BY CAST(LEAST((doc_id * 10) // (mx + 1), 9) AS INTEGER)
"""


@register("ngram_novelty_docs", _NOVELTY_SQL)
def ngram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bg = (
        toks.select(
            "doc_id", F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
        )
        .select("doc_id", F.array_join(F.slice("t", F.col("i"), 2), " ").alias("b"))
        .distinct()
    )
    firsts = bg.groupBy("b").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        bg.join(firsts, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    maxd = per_doc.agg(F.max("doc_id").alias("mx"))
    # floor division on both engines (DuckDB // vs F.floor) — a plain
    # double cast would round on one engine and truncate on the other
    decile = F.least(
        F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)).cast("long"), F.lit(9)
    ).cast("int")
    return (
        per_doc.crossJoin(maxd)
        .groupBy(decile.alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
            F.round(F.sum("n_novel") * 1.0 / F.sum("n_bigrams"), 6).alias(
                "novelty_rate"
            ),
        )
    )


_JSD_SQL = r"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE lang IN ('en', 'de')
    ),
    cnt AS (
      SELECT lang, tok, COUNT(*) AS c FROM toks WHERE len(tok) > 0 GROUP BY lang, tok
    ),
    tot AS (SELECT lang, SUM(c) AS n FROM cnt GROUP BY lang),
    p AS (
      SELECT c.tok,
             SUM(CASE WHEN c.lang = 'en' THEN c.c * 1.0 / t.n ELSE 0.0 END) AS pe,
             SUM(CASE WHEN c.lang = 'de' THEN c.c * 1.0 / t.n ELSE 0.0 END) AS pd
      FROM cnt c JOIN tot t ON c.lang = t.lang
      GROUP BY c.tok
    ),
    terms AS (
      SELECT tok, pe, pd, (pe + pd) / 2.0 AS m,
             CASE WHEN pe > 0 THEN pe * ln(pe / ((pe + pd) / 2.0)) / ln(2.0)
                  ELSE 0.0 END AS kl_e,
             CASE WHEN pd > 0 THEN pd * ln(pd / ((pe + pd) / 2.0)) / ln(2.0)
                  ELSE 0.0 END AS kl_d
      FROM p
    )
    SELECT COUNT(*) AS n_types,
           ROUND(SUM(kl_e) / 2.0 + SUM(kl_d) / 2.0, 6) AS jsd_bits,
           ROUND(SUM(CASE WHEN pe > 0 AND pd > 0 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
             AS shared_type_frac
    FROM terms
"""


@register("jsd_divergence_docs", _JSD_SQL)
def jsd_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    cnt = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    p = (
        cnt.join(tot, "lang")
        .groupBy("tok")
        .agg(
            F.sum(
                F.when(F.col("lang") == "en", F.col("c") * 1.0 / F.col("n")).otherwise(
                    0.0
                )
            ).alias("pe"),
            F.sum(
                F.when(F.col("lang") == "de", F.col("c") * 1.0 / F.col("n")).otherwise(
                    0.0
                )
            ).alias("pd"),
        )
    )
    m = (F.col("pe") + F.col("pd")) / 2.0
    terms = p.select(
        "pe",
        "pd",
        F.when(F.col("pe") > 0, F.col("pe") * F.log(F.col("pe") / m) / F.log(F.lit(2.0)))
        .otherwise(0.0)
        .alias("kl_e"),
        F.when(F.col("pd") > 0, F.col("pd") * F.log(F.col("pd") / m) / F.log(F.lit(2.0)))
        .otherwise(0.0)
        .alias("kl_d"),
    )
    return terms.agg(
        F.count("*").alias("n_types"),
        F.round(F.sum("kl_e") / 2.0 + F.sum("kl_d") / 2.0, 6).alias("jsd_bits"),
        F.round(
            F.sum(F.when((F.col("pe") > 0) & (F.col("pd") > 0), 1.0).otherwise(0.0))
            / F.count("*"),
            6,
        ).alias("shared_type_frac"),
    )
