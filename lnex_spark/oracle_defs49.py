"""Forty-ninth oracle-registry module: probabilistic record linkage
(Fellegi-Sunter) and golden-record survivorship.

  * fs_weights_docs — Fellegi-Sunter m/u probabilities and log2
    agreement/disagreement weights for three comparison fields
    (lang, source, 64-char length bucket) estimated from a labeled
    pair set: match pairs are deterministic clones injected with
    controlled field noise (source kept only when doc_id%5=0,
    length shifted a bucket when doc_id%9=0), non-match pairs are
    adjacent distinct originals.  Laplace-smoothed (+0.5/+1) so no
    weight is ±inf.  This is the classic probabilistic-ER scoring
    model; at corpus scale the estimation is three AVG aggregates
    over the (already blocked) pair table — nothing quadratic.

  * golden_record_docs — survivorship after dedup clustering: the
    corpus is originals plus TRUNCATED clones (excerpt records), a
    cluster is a shared 50-char normalized-prefix key, and the
    golden record per multi-member cluster is the most complete one
    (longest text, doc_id tiebreak) — argmax as max_by over an
    orderable struct, one hash aggregate, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# fs_weights_docs
# ---------------------------------------------------------------------------

_FS_SQL = """
    WITH base AS (
      SELECT doc_id, lang, source, n_chars
      FROM documents WHERE doc_id < 300
    ),
    match_pairs AS (
      SELECT CAST(lang = lang AS INTEGER) AS lang_agree,
             CAST((CASE WHEN doc_id % 5 = 0 THEN source ELSE 'clone_src' END) = source
                  AS INTEGER) AS source_agree,
             CAST(floor((n_chars + CASE WHEN doc_id % 9 = 0 THEN 70 ELSE 0 END) / 64.0)
                  = floor(n_chars / 64.0) AS INTEGER) AS len_agree
      FROM base WHERE doc_id % 3 = 0
    ),
    nonmatch_pairs AS (
      SELECT CAST(a.lang = b.lang AS INTEGER) AS lang_agree,
             CAST(a.source = b.source AS INTEGER) AS source_agree,
             CAST(floor(a.n_chars / 64.0) = floor(b.n_chars / 64.0) AS INTEGER) AS len_agree
      FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
    ),
    m AS (
      SELECT 'lang' AS field, (SUM(lang_agree) + 0.5) / (COUNT(*) + 1.0) AS p FROM match_pairs
      UNION ALL
      SELECT 'source', (SUM(source_agree) + 0.5) / (COUNT(*) + 1.0) FROM match_pairs
      UNION ALL
      SELECT 'len_bucket', (SUM(len_agree) + 0.5) / (COUNT(*) + 1.0) FROM match_pairs
    ),
    u AS (
      SELECT 'lang' AS field, (SUM(lang_agree) + 0.5) / (COUNT(*) + 1.0) AS p FROM nonmatch_pairs
      UNION ALL
      SELECT 'source', (SUM(source_agree) + 0.5) / (COUNT(*) + 1.0) FROM nonmatch_pairs
      UNION ALL
      SELECT 'len_bucket', (SUM(len_agree) + 0.5) / (COUNT(*) + 1.0) FROM nonmatch_pairs
    )
    SELECT m.field,
           ROUND(m.p, 6) AS m_prob,
           ROUND(u.p, 6) AS u_prob,
           ROUND(log2(m.p / u.p), 6) AS w_agree,
           ROUND(log2((1 - m.p) / (1 - u.p)), 6) AS w_disagree
    FROM m JOIN u ON m.field = u.field
"""


@register("fs_weights_docs", _FS_SQL)
def fs_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter field weights from labeled match/non-match
    pairs.  Integer division on the length bucket is written as
    floor-div on BOTH engines (all quantities non-negative)."""
    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < 300).select("doc_id", "lang", "source", "n_chars")

    mp = base.filter(F.col("doc_id") % 3 == 0).select(
        F.lit(1).alias("lang_agree"),
        (
            F.when(F.col("doc_id") % 5 == 0, F.col("source")).otherwise(F.lit("clone_src"))
            == F.col("source")
        ).cast("int").alias("source_agree"),
        (
            F.floor((F.col("n_chars") + F.when(F.col("doc_id") % 9 == 0, 70).otherwise(0)) / 64)
            == F.floor(F.col("n_chars") / 64)
        ).cast("int").alias("len_agree"),
    )
    a, b = base.alias("a"), base.alias("b")
    np_ = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        (F.col("a.lang") == F.col("b.lang")).cast("int").alias("lang_agree"),
        (F.col("a.source") == F.col("b.source")).cast("int").alias("source_agree"),
        (F.floor(F.col("a.n_chars") / 64) == F.floor(F.col("b.n_chars") / 64))
        .cast("int").alias("len_agree"),
    )

    def probs(df: DataFrame) -> DataFrame:
        agg = df.agg(
            *[
                ((F.sum(c) + 0.5) / (F.count("*") + 1.0)).alias(c)
                for c in ["lang_agree", "source_agree", "len_agree"]
            ]
        )
        pairs = F.array(
            F.struct(F.lit("lang").alias("field"), F.col("lang_agree").alias("p")),
            F.struct(F.lit("source").alias("field"), F.col("source_agree").alias("p")),
            F.struct(F.lit("len_bucket").alias("field"), F.col("len_agree").alias("p")),
        )
        return agg.select(F.explode(pairs).alias("e")).select("e.field", "e.p")

    m = probs(mp).withColumnRenamed("p", "mp")
    u = probs(np_).withColumnRenamed("p", "up")
    return m.join(u, "field").select(
        "field",
        F.round("mp", 6).alias("m_prob"),
        F.round("up", 6).alias("u_prob"),
        F.round(F.log2(F.col("mp") / F.col("up")), 6).alias("w_agree"),
        F.round(F.log2((1 - F.col("mp")) / (1 - F.col("up"))), 6).alias("w_disagree"),
    )


# ---------------------------------------------------------------------------
# golden_record_docs
# ---------------------------------------------------------------------------

_GOLDEN_SQL = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, 100)
      FROM documents WHERE doc_id < 400 AND doc_id % 4 = 0
    ),
    keyed AS (
      SELECT doc_id,
             md5(substr(lower(trim(text)), 1, 50)) AS cluster_id,
             length(text) AS text_len
      FROM corpus
    ),
    clusters AS (
      SELECT cluster_id,
             COUNT(*) AS n_members,
             MIN(doc_id) AS min_doc_id,
             MAX(text_len) AS max_len
      FROM keyed GROUP BY cluster_id HAVING COUNT(*) >= 2
    ),
    golden AS (
      SELECT k.cluster_id,
             MIN(struct_pack(neg_len := -k.text_len, doc_id := k.doc_id)).doc_id
               AS golden_doc_id
      FROM keyed k JOIN clusters c ON k.cluster_id = c.cluster_id
      GROUP BY k.cluster_id
    )
    SELECT c.cluster_id, g.golden_doc_id, c.n_members, c.max_len
    FROM clusters c JOIN golden g ON c.cluster_id = g.cluster_id
"""


@register("golden_record_docs", _GOLDEN_SQL)
def golden_record_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden record per dedup cluster: most complete member wins
    (longest text, doc_id tiebreak), as a struct-min aggregation —
    one hash agg per cluster, no per-cluster window, so survivorship
    costs the same as the counting it rides with."""
    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < 400).select("doc_id", "text")
    clones = (
        d.filter((F.col("doc_id") < 400) & (F.col("doc_id") % 4 == 0))
        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                F.substring("text", 1, 100).alias("text"))
    )
    keyed = base.unionByName(clones).select(
        "doc_id",
        F.md5(F.substring(F.lower(F.trim(F.col("text"))), 1, 50)).alias("cluster_id"),
        F.length("text").alias("text_len"),
    )
    clusters = (
        keyed.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("text_len").alias("max_len"),
        )
        .filter(F.col("n_members") >= 2)
    )
    golden = (
        keyed.join(clusters.select("cluster_id"), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.min(F.struct((-F.col("text_len")).alias("neg_len"), F.col("doc_id")))
            .getField("doc_id")
            .alias("golden_doc_id")
        )
    )
    return clusters.join(golden, "cluster_id").select(
        "cluster_id", "golden_doc_id", "n_members", "max_len"
    )
