"""Seventy-third oracle-registry module: chunk-dedup savings and
entity-resolution evaluation.

  * cdc_dedup_savings_docs — the payoff measurement for
    content-defined chunking: chunk CONTENT hashes (md5 over the
    ordered tokens of each chunk) across a corpus containing
    full-prefix clones, total vs distinct chunk mass, and the
    storage-dedup ratio.  Clones share every chunk boundary inside
    the copied prefix (boundaries are content-defined), so the
    savings are real and deterministic; fixed-size chunking would
    misalign after any edit.

  * er_pairwise_eval_docs — pairwise precision/recall/F1 of a dedup
    clustering against injected ground truth: truth pairs are the
    (original, clone) injections, predicted pairs come from the
    50-char normalized-prefix cluster key (the golden_record_docs
    clustering).  The standard ER evaluation: counts of
    predicted/true/overlapping pairs via one join of the two pair
    sets — each derived from cluster sizes, never materializing
    O(n²) candidate space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CDC_SAVE_SQL = r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, 200)
      FROM documents WHERE doc_id < 100 AND doc_id % 3 = 0
    ),
    arrs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM corpus
    ),
    toks AS (
      SELECT doc_id, u.i AS pos, ts[u.i] AS tok,
             CASE WHEN u.i >= 4 AND
               CAST(('0x' || substr(md5(ts[u.i - 3] || ' ' || ts[u.i - 2] || ' ' ||
                     ts[u.i - 1] || ' ' || ts[u.i]), 1, 4)) AS INTEGER) % 16 = 0
               THEN 1 ELSE 0 END AS boundary
      FROM arrs, (SELECT unnest(range(1, 2000)) AS i) u
      WHERE u.i <= len(ts)
    ),
    chunked AS (
      SELECT doc_id, pos, tok,
             SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chash,
             COUNT(*) AS chunk_len
      FROM chunked GROUP BY doc_id, chunk_id
    ),
    mass AS (
      SELECT CAST(SUM(chunk_len) AS BIGINT) AS total_tokens,
             COUNT(*) AS total_chunks
      FROM chunks
    ),
    uniq AS (
      SELECT CAST(SUM(chunk_len) AS BIGINT) AS unique_tokens,
             COUNT(*) AS unique_chunks
      FROM (SELECT chash, MIN(chunk_len) AS chunk_len FROM chunks GROUP BY chash)
    )
    SELECT m.total_chunks, u.unique_chunks, m.total_tokens, u.unique_tokens,
           ROUND(1.0 - u.unique_tokens * 1.0 / m.total_tokens, 6) AS dedup_savings
    FROM mass m, uniq u
"""


@register("cdc_dedup_savings_docs", _CDC_SAVE_SQL)
def cdc_dedup_savings_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = d.select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    corpus = base.unionByName(clones)
    arrs = corpus.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("ts"))
    toks = arrs.select(
        "doc_id", F.posexplode("ts").alias("pos0", "tok"), F.col("ts")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok", "ts")
    window_txt = F.concat_ws(
        " ",
        F.expr("ts[pos - 4]"),
        F.expr("ts[pos - 3]"),
        F.expr("ts[pos - 2]"),
        F.expr("ts[pos - 1]"),
    )
    boundary = F.when(
        (F.col("pos") >= 4)
        & (
            F.pmod(F.conv(F.substring(F.md5(window_txt), 1, 4), 16, 10).cast("long"), F.lit(16))
            == 0
        ),
        1,
    ).otherwise(0)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    chunked = toks.select(
        "doc_id", "pos", "tok", F.sum(boundary).over(w).alias("chunk_id")
    )
    chunks = (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                        ),
                        lambda s: s.getField("tok"),
                    ),
                    " ",
                )
            ).alias("chash"),
            F.count("*").alias("chunk_len"),
        )
    )
    mass = chunks.agg(
        F.sum("chunk_len").cast("long").alias("total_tokens"),
        F.count("*").alias("total_chunks"),
    )
    uniq = (
        chunks.groupBy("chash")
        .agg(F.min("chunk_len").alias("chunk_len"))
        .agg(
            F.sum("chunk_len").cast("long").alias("unique_tokens"),
            F.count("*").alias("unique_chunks"),
        )
    )
    return mass.crossJoin(uniq).select(
        "total_chunks",
        "unique_chunks",
        "total_tokens",
        "unique_tokens",
        F.round(1.0 - F.col("unique_tokens") * 1.0 / F.col("total_tokens"), 6).alias(
            "dedup_savings"
        ),
    )


_ER_EVAL_SQL = """
    WITH corpus AS (
      SELECT doc_id, text, CAST(NULL AS BIGINT) AS clone_of
      FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, 100), doc_id
      FROM documents WHERE doc_id < 400 AND doc_id % 4 = 0
    ),
    keyed AS (
      SELECT doc_id, clone_of,
             md5(substr(lower(trim(text)), 1, 50)) AS cluster_id
      FROM corpus
    ),
    pred_sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM keyed GROUP BY cluster_id
    ),
    n_pred AS (
      SELECT CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS n FROM pred_sizes
    ),
    truth_pairs AS (
      SELECT clone_of AS a, doc_id AS b FROM keyed WHERE clone_of IS NOT NULL
    ),
    n_true AS (SELECT COUNT(*) AS n FROM truth_pairs),
    hits AS (
      SELECT COUNT(*) AS n
      FROM truth_pairs t
      JOIN keyed ka ON ka.doc_id = t.a
      JOIN keyed kb ON kb.doc_id = t.b
      WHERE ka.cluster_id = kb.cluster_id
    )
    SELECT p.n AS n_pred_pairs, t.n AS n_true_pairs, h.n AS n_hit_pairs,
           ROUND(h.n * 1.0 / p.n, 6) AS pair_precision,
           ROUND(h.n * 1.0 / t.n, 6) AS pair_recall,
           ROUND(2.0 * h.n / (p.n + t.n), 6) AS pair_f1
    FROM n_pred p, n_true t, hits h
"""


@register("er_pairwise_eval_docs", _ER_EVAL_SQL)
def er_pairwise_eval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    base = d.select("doc_id", "text", F.lit(None).cast("long").alias("clone_of"))
    clones = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.substring("text", 1, 100).alias("text"),
        F.col("doc_id").alias("clone_of"),
    )
    keyed = base.unionByName(clones).select(
        "doc_id",
        "clone_of",
        F.md5(F.substring(F.lower(F.trim("text")), 1, 50)).alias("cluster_id"),
    )
    n_pred = (
        keyed.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .agg(F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("n_pred_pairs"))
    )
    truth = keyed.filter(F.col("clone_of").isNotNull()).select(
        F.col("clone_of").alias("a"), F.col("doc_id").alias("b")
    )
    n_true = truth.agg(F.count("*").alias("n_true_pairs"))
    ka = keyed.select(F.col("doc_id").alias("a"), F.col("cluster_id").alias("ca"))
    kb = keyed.select(F.col("doc_id").alias("b"), F.col("cluster_id").alias("cb"))
    hits = (
        truth.join(ka, "a")
        .join(kb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .agg(F.count("*").alias("n_hit_pairs"))
    )
    return n_pred.crossJoin(n_true).crossJoin(hits).select(
        "n_pred_pairs",
        "n_true_pairs",
        "n_hit_pairs",
        F.round(F.col("n_hit_pairs") * 1.0 / F.col("n_pred_pairs"), 6).alias("pair_precision"),
        F.round(F.col("n_hit_pairs") * 1.0 / F.col("n_true_pairs"), 6).alias("pair_recall"),
        F.round(
            2.0 * F.col("n_hit_pairs") / (F.col("n_pred_pairs") + F.col("n_true_pairs")), 6
        ).alias("pair_f1"),
    )
