"""Hundred-eighty-second oracle-registry module: weighted-token
record-linkage scoring — the similarity measures that bridge exact
set overlap and pure edit distance.

  * soft_tfidf_parts — Cohen/Ravikumar/Fienberg SoftTF-IDF between
    adjacent part names (p_partkey % 20 = 0 paired with +1):
    for each token a of A, find its best Jaro-Winkler match b in B;
    if JW >= 0.9 the pair contributes w(a) * w(b) * JW with
    L2-normalized ln-IDF token weights from the whole part-name
    corpus.  Inner JW from two independent engines (the Arrow
    pandas UDF of oracle_defs130 vs DuckDB's native function), like
    monge_elkan_parts — but unlike Monge-Elkan, rare tokens
    dominate: typo'd SKUs match while generic color words stop
    inflating scores.

  * tversky_docs — Tversky asymmetric set similarity (alpha = 0.8,
    beta = 0.2) between consecutive documents' 3-shingle sets:
    S(A,B) = |A∩B| / (|A∩B| + a|A-B| + b|B-A|), emitted next to
    Jaccard and Dice which are its special cases.  The asymmetry is
    the point: "is A contained in B" (template detection, quote
    detection) needs a|A-B| weighted differently from b|B-A| —
    the containment_pairs op generalized to a tunable family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SOFT_SQL = """
    WITH toks AS (
      SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS tok FROM part
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT p_partkey) AS df FROM toks GROUP BY tok
    ),
    nd AS (SELECT COUNT(*) AS nd FROM part),
    idf AS (
      SELECT tok, LN(1.0 + (SELECT nd FROM nd) / df) AS w FROM df
    ),
    pairs AS (
      SELECT a.p_partkey AS k, a.p_name AS na, b.p_name AS nb
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      WHERE a.p_partkey % 20 = 0
    ),
    ta AS (
      SELECT k, UNNEST(string_split(na, ' ')) AS tok_a FROM pairs
    ),
    tb AS (
      SELECT k, UNNEST(string_split(nb, ' ')) AS tok_b FROM pairs
    ),
    na_norm AS (
      SELECT ta.k, SQRT(SUM(i.w * i.w)) AS nrm
      FROM ta JOIN idf i ON i.tok = ta.tok_a GROUP BY ta.k
    ),
    nb_norm AS (
      SELECT tb.k, SQRT(SUM(i.w * i.w)) AS nrm
      FROM tb JOIN idf i ON i.tok = tb.tok_b GROUP BY tb.k
    ),
    tp AS (
      SELECT ta.k, ta.tok_a, tb.tok_b,
             jaro_winkler_similarity(ta.tok_a, tb.tok_b) AS jw
      FROM ta JOIN tb ON tb.k = ta.k
    ),
    best0 AS (
      SELECT k, tok_a, MAX(jw) AS jw FROM tp GROUP BY k, tok_a
    ),
    best AS (
      SELECT t.k, t.tok_a, b.jw, MIN(t.tok_b) AS tok_b
      FROM tp t JOIN best0 b
        ON b.k = t.k AND b.tok_a = t.tok_a AND t.jw = b.jw
      GROUP BY t.k, t.tok_a, b.jw
    ),
    contrib AS (
      SELECT b.k,
             SUM(CASE WHEN b.jw >= 0.9
                      THEN (ia.w / an.nrm) * (ib.w / bn.nrm) * b.jw
                      ELSE 0 END) AS s
      FROM best b
      JOIN idf ia ON ia.tok = b.tok_a
      JOIN idf ib ON ib.tok = b.tok_b
      JOIN na_norm an ON an.k = b.k
      JOIN nb_norm bn ON bn.k = b.k
      GROUP BY b.k
    )
    SELECT k AS p_partkey, ROUND(s, 6) AS soft_tfidf
    FROM contrib
    ORDER BY p_partkey
"""


@register("soft_tfidf_parts", _SOFT_SQL)
def soft_tfidf_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs130 import _jw_batch

    p = _t(spark, sf_dir, "part")
    toks = p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("tok")
    )
    nd = p.count()
    idf = (
        toks.groupBy("tok")
        .agg(F.countDistinct("p_partkey").alias("df"))
        .select("tok", F.log(1.0 + F.lit(nd) / F.col("df")).alias("w"))
    )
    a = p.where(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("na")
    )
    b = p.select(F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"))
    pairs = a.join(b, F.col("kb") == F.col("k") + 1).select("k", "na", "nb")
    ta = pairs.select("k", F.explode(F.split("na", " ")).alias("tok_a"))
    tb = pairs.select("k", F.explode(F.split("nb", " ")).alias("tok_b"))
    ia = idf.select(F.col("tok").alias("tok_a"), F.col("w").alias("wa"))
    ib = idf.select(F.col("tok").alias("tok_b"), F.col("w").alias("wb"))
    na_norm = (
        ta.join(F.broadcast(ia), "tok_a")
        .groupBy("k")
        .agg(F.sqrt(F.sum(F.col("wa") * F.col("wa"))).alias("an"))
    )
    nb_norm = (
        tb.join(F.broadcast(ib), "tok_b")
        .groupBy("k")
        .agg(F.sqrt(F.sum(F.col("wb") * F.col("wb"))).alias("bn"))
    )
    jw = F.pandas_udf(_jw_batch, DoubleType())
    tp = ta.join(tb, "k").withColumn("jw", jw("tok_a", "tok_b"))
    best0 = tp.groupBy("k", "tok_a").agg(F.max("jw").alias("jw"))
    best = (
        tp.join(best0, ["k", "tok_a", "jw"])
        .groupBy("k", "tok_a", "jw")
        .agg(F.min("tok_b").alias("tok_b"))
    )
    contrib = (
        best.join(F.broadcast(ia), "tok_a")
        .join(F.broadcast(ib), "tok_b")
        .join(na_norm, "k")
        .join(nb_norm, "k")
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("jw") >= 0.9,
                    (F.col("wa") / F.col("an"))
                    * (F.col("wb") / F.col("bn"))
                    * F.col("jw"),
                ).otherwise(0.0)
            ).alias("s")
        )
    )
    return contrib.select(
        F.col("k").alias("p_partkey"), F.round("s", 6).alias("soft_tfidf")
    ).orderBy("p_partkey")


_TVERSKY_SQL = """
    WITH sh AS (
      SELECT doc_id,
             substr(text, i, 3) AS g
      FROM documents, UNNEST(range(1, GREATEST(len(text) - 1, 1))) AS t(i)
      WHERE len(text) >= 3
      GROUP BY doc_id, substr(text, i, 3)
    ),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM (SELECT DISTINCT doc_id FROM sh) a
      JOIN (SELECT DISTINCT doc_id FROM sh) b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 10 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.da, p.db, COUNT(*) AS i
      FROM pairs p
      JOIN sh a ON a.doc_id = p.da
      JOIN sh b ON b.doc_id = p.db AND b.g = a.g
      GROUP BY p.da, p.db
    )
    SELECT p.da AS doc_a, p.db AS doc_b,
           COALESCE(i.i, 0) AS common,
           ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jaccard,
           ROUND(2.0 * COALESCE(i.i, 0) / (sa.n + sb.n), 6) AS dice,
           ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (COALESCE(i.i, 0) + 0.8 * (sa.n - COALESCE(i.i, 0))
                    + 0.2 * (sb.n - COALESCE(i.i, 0))), 6) AS tversky
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.da
    JOIN sizes sb ON sb.doc_id = p.db
    LEFT JOIN inter i ON i.da = p.da AND i.db = p.db
    ORDER BY doc_a
"""


@register("tversky_docs", _TVERSKY_SQL)
def tversky_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.length("text") >= 3)
    sh = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 2, 1)),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    ids = sh.select("doc_id").distinct()
    a = ids.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("da")
    )
    b = ids.select(F.col("doc_id").alias("db"))
    pairs = a.join(b, F.col("db") == F.col("da") + 1)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("da"), F.col("g").alias("ga"))
    shb = sh.select(F.col("doc_id").alias("db"), F.col("g").alias("gb"))
    inter = (
        pairs.join(sha, "da")
        .join(shb, ["db"])
        .where(F.col("ga") == F.col("gb"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    i0 = F.coalesce(F.col("i"), F.lit(0))
    return (
        pairs.join(sa, "da")
        .join(sb, "db")
        .join(inter, ["da", "db"], "left")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            i0.alias("common"),
            F.round(
                i0.cast("double") / (F.col("na") + F.col("nb") - i0), 6
            ).alias("jaccard"),
            F.round(2.0 * i0 / (F.col("na") + F.col("nb")), 6).alias("dice"),
            F.round(
                i0.cast("double")
                / (i0 + 0.8 * (F.col("na") - i0) + 0.2 * (F.col("nb") - i0)),
                6,
            ).alias("tversky"),
        )
        .orderBy("doc_a")
    )
