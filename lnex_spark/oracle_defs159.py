"""Hundred-fifty-ninth oracle-registry module: unsupervised keyphrase
extraction and stylometric authorship distance over the documents
corpus.

  * rake_keywords_docs — RAKE (Rapid Automatic Keyword Extraction):
    documents are split into candidate phrases at stopword
    boundaries ('a'/'the') using an island encoding — stop flags,
    running sum of flags as phrase id, consecutive content words
    grouped per (doc, phrase id).  Corpus-level word scores
    degree(w)/freq(w) (degree = total length of phrases containing
    each occurrence of w), phrase score = sum of member word scores;
    top 20 phrases by (score, support, text).  The zero-training
    keyphrase extractor — candidate generation for the gazetteer
    alt-name mining stage, pure set ops end to end.

  * burrows_delta_docs — Burrows' Delta authorship distance between
    every pair of sources: per-source relative frequencies of the 20
    globally most frequent words (rank ties broken by word),
    z-scored ACROSS sources per word (population sd), Delta = mean
    |z_a - z_b| over the feature words.  The classic stylometry
    measure — here a source-level fingerprint distance that flags
    near-duplicate feeds upstream of dedup (cross-check:
    source_quality_profile, vocab_overlap_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_RAKE_SQL = """
    WITH toks AS (
      SELECT doc_id, t.tok, t.pos
      FROM documents,
           LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
                           UNNEST(range(1, len(string_split(text, ' ')) + 1))
                             AS pos) t
      WHERE t.tok <> ''
    ),
    flagged AS (
      SELECT doc_id, tok, pos,
             CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END AS stop
      FROM toks
    ),
    islands AS (
      SELECT doc_id, tok, pos, stop,
             SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged
    ),
    phrases AS (
      SELECT doc_id, isl,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM islands WHERE stop = 0
      GROUP BY doc_id, isl
    ),
    members AS (
      SELECT doc_id, isl, tok FROM islands WHERE stop = 0
    ),
    wstats AS (
      SELECT m.tok,
             CAST(COUNT(*) AS DOUBLE) AS freq,
             CAST(SUM(p.plen) AS DOUBLE) AS degree
      FROM members m JOIN phrases p
        ON p.doc_id = m.doc_id AND p.isl = m.isl
      GROUP BY m.tok
    ),
    pscore AS (
      SELECT p.phrase,
             COUNT(DISTINCT p.doc_id || '#' || p.isl) AS support,
             SUM(w.degree / w.freq) / COUNT(DISTINCT p.doc_id || '#' || p.isl)
               AS score
      FROM phrases p
      JOIN members m ON m.doc_id = p.doc_id AND m.isl = p.isl
      JOIN wstats w ON w.tok = m.tok
      GROUP BY p.phrase
    )
    SELECT phrase, CAST(support AS BIGINT) AS support,
           ROUND(score, 6) AS score
    FROM pscore
    ORDER BY score DESC, support DESC, phrase
    LIMIT 20
"""


@register("rake_keywords_docs", _RAKE_SQL)
def rake_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).where(F.col("tok") != "").select(
        "doc_id", "tok", (F.col("pos0") + 1).alias("pos")
    )
    flagged = toks.withColumn(
        "stop", F.when(F.col("tok").isin("a", "the"), 1).otherwise(0)
    )
    wisl = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("isl", F.sum("stop").over(wisl))
    content = islands.where(F.col("stop") == 0)
    phrases = content.groupBy("doc_id", "isl").agg(
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("pos", "tok"))).getField("tok")
        ).alias("phrase"),
        F.count("*").alias("plen"),
    )
    members = content.select("doc_id", "isl", "tok")
    wstats = (
        members.join(phrases, ["doc_id", "isl"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("double").alias("freq"),
            F.sum("plen").cast("double").alias("degree"),
        )
    )
    key = F.concat_ws("#", F.col("doc_id").cast("string"), F.col("isl").cast("string"))
    pscore = (
        phrases.join(members, ["doc_id", "isl"])
        .join(F.broadcast(wstats), "tok")
        .groupBy("phrase")
        .agg(
            F.countDistinct(key).alias("support"),
            (
                F.sum(F.col("degree") / F.col("freq")) / F.countDistinct(key)
            ).alias("score"),
        )
    )
    return (
        pscore.select(
            "phrase",
            F.col("support").cast("long").alias("support"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("support"), "phrase")
        .limit(20)
    )


_BURROWS_SQL = """
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
    topw AS (
      SELECT tok FROM clean GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT 20
    ),
    stot AS (SELECT source, COUNT(*) AS nt FROM clean GROUP BY source),
    rel AS (
      SELECT c.source, c.tok,
             CAST(COUNT(*) AS DOUBLE) / MAX(s.nt) AS f
      FROM clean c JOIN topw t ON c.tok = t.tok
      JOIN stot s ON s.source = c.source
      GROUP BY c.source, c.tok
    ),
    dense AS (
      SELECT s.source, t.tok, COALESCE(r.f, 0) AS f
      FROM stot s CROSS JOIN topw t
      LEFT JOIN rel r ON r.source = s.source AND r.tok = t.tok
    ),
    z AS (
      SELECT source, tok,
             (f - AVG(f) OVER (PARTITION BY tok))
               / STDDEV_POP(f) OVER (PARTITION BY tok) AS z
      FROM dense
    )
    SELECT a.source AS source_a, b.source AS source_b,
           ROUND(AVG(ABS(a.z - b.z)), 6) AS delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
"""


@register("burrows_delta_docs", _BURROWS_SQL)
def burrows_delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    topw = (
        clean.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(20)
        .select("tok")
    )
    stot = clean.groupBy("source").agg(F.count("*").alias("nt"))
    rel = (
        clean.join(F.broadcast(topw), "tok")
        .join(F.broadcast(stot), "source")
        .groupBy("source", "tok")
        .agg((F.count("*").cast("double") / F.max("nt")).alias("f"))
    )
    dense = (
        stot.select("source")
        .crossJoin(F.broadcast(topw))
        .join(rel, ["source", "tok"], "left")
        .na.fill({"f": 0.0})
    )
    wt = Window.partitionBy("tok")
    z = dense.select(
        "source",
        "tok",
        (
            (F.col("f") - F.avg("f").over(wt)) / F.stddev_pop("f").over(wt)
        ).alias("z"),
    )
    a = z.alias("a")
    b = z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.round(F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6).alias("delta"))
        .orderBy("source_a", "source_b")
    )
