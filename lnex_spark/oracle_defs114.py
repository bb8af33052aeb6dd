"""Hundred-fourteenth oracle-registry module: generation-style text
evaluation and diversity re-ranking.

  * bleu_clone_docs — corpus BLEU-2 of perturbed clones against
    their originals (candidate = original text + two novel tokens,
    so precisions are provably < 1 by construction): clipped
    unigram/bigram precision with per-pair reference-count clipping,
    brevity penalty from exact corpus lengths, BLEU =
    BP·exp(½(ln p1 + ln p2)).  The n-gram-overlap generation-eval
    family (MT/summarization scoring) — absent until now — reduced
    to two grouped joins with LEAST-clipping; all counts integer.

  * mmr_rerank_embeddings — maximal marginal relevance re-ranking:
    query = vector 0, top-8 cosine candidates, three unrolled greedy
    picks maximizing 0.7·relevance − 0.3·max-similarity-to-selected
    (every cosine and every score ROUNDED to 6 before each argmax,
    id tiebreaks, so the greedy trajectory is cross-engine exact).
    The retrieval-diversity step between ANN scoring and what a
    user actually sees — redundant near-duplicates suppressed in
    favor of coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_BLEU_SQL = r"""
    WITH refs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id < 500
    ),
    cands AS (
      SELECT doc_id, string_split_regex(lower(trim(text)) || ' zq17x zq17y', '\s+') AS t
      FROM documents WHERE doc_id < 500
    ),
    r1 AS (
      SELECT doc_id, unnest(t) AS g FROM refs
    ),
    c1 AS (
      SELECT doc_id, unnest(t) AS g FROM cands
    ),
    r1c AS (SELECT doc_id, g, COUNT(*) AS rc FROM r1 WHERE len(g) > 0 GROUP BY 1, 2),
    c1c AS (SELECT doc_id, g, COUNT(*) AS cc FROM c1 WHERE len(g) > 0 GROUP BY 1, 2),
    m1 AS (
      SELECT SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS clipped, SUM(c.cc) AS total
      FROM c1c c LEFT JOIN r1c r ON c.doc_id = r.doc_id AND c.g = r.g
    ),
    r2 AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM refs WHERE len(t) >= 2)
    ),
    c2 AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM cands WHERE len(t) >= 2)
    ),
    r2c AS (SELECT doc_id, g, COUNT(*) AS rc FROM r2 GROUP BY 1, 2),
    c2c AS (SELECT doc_id, g, COUNT(*) AS cc FROM c2 GROUP BY 1, 2),
    m2 AS (
      SELECT SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS clipped, SUM(c.cc) AS total
      FROM c2c c LEFT JOIN r2c r ON c.doc_id = r.doc_id AND c.g = r.g
    ),
    lens AS (
      SELECT (SELECT SUM(len(t)) FROM refs) AS r_len,
             (SELECT SUM(len(t)) FROM cands) AS c_len
    )
    SELECT CAST(m1.clipped AS BIGINT) AS uni_clipped,
           CAST(m1.total AS BIGINT) AS uni_total,
           CAST(m2.clipped AS BIGINT) AS bi_clipped,
           CAST(m2.total AS BIGINT) AS bi_total,
           ROUND(m1.clipped * 1.0 / m1.total, 6) AS p1,
           ROUND(m2.clipped * 1.0 / m2.total, 6) AS p2,
           ROUND(CASE WHEN l.c_len >= l.r_len THEN 1.0
                      ELSE exp(1.0 - l.r_len * 1.0 / l.c_len) END
                 * exp(0.5 * (ln(m1.clipped * 1.0 / m1.total)
                              + ln(m2.clipped * 1.0 / m2.total))), 6) AS bleu2
    FROM m1, m2, lens l
"""


@register("bleu_clone_docs", _BLEU_SQL)
def bleu_clone_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    refs = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    cands = d.select(
        "doc_id",
        F.split(
            F.concat(F.lower(F.trim(F.col("text"))), F.lit(" zq17x zq17y")), r"\s+"
        ).alias("t"),
    )

    def ngram_counts(df, n):
        if n == 1:
            g = df.select("doc_id", F.explode("t").alias("g")).filter(
                F.length("g") > 0
            )
        else:
            g = df.filter(F.size("t") >= 2).select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
                "t",
            ).select("doc_id", F.array_join(F.slice("t", F.col("i"), 2), " ").alias("g"))
        return g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))

    def modified_precision(n):
        rc = ngram_counts(refs, n).withColumnRenamed("c", "rc")
        cc = ngram_counts(cands, n).withColumnRenamed("c", "cc")
        return cc.join(rc, ["doc_id", "g"], "left").agg(
            F.sum(F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0)))).alias(
                "clipped"
            ),
            F.sum("cc").alias("total"),
        )

    m1 = modified_precision(1).select(
        F.col("clipped").alias("uc"), F.col("total").alias("ut")
    )
    m2 = modified_precision(2).select(
        F.col("clipped").alias("bc"), F.col("total").alias("bt")
    )
    lens = refs.agg(F.sum(F.size("t")).alias("r_len")).crossJoin(
        cands.agg(F.sum(F.size("t")).alias("c_len"))
    )
    p1 = F.col("uc") * 1.0 / F.col("ut")
    p2 = F.col("bc") * 1.0 / F.col("bt")
    bp = F.when(F.col("c_len") >= F.col("r_len"), 1.0).otherwise(
        F.exp(1.0 - F.col("r_len") * 1.0 / F.col("c_len"))
    )
    return m1.crossJoin(m2).crossJoin(lens).select(
        F.col("uc").cast("long").alias("uni_clipped"),
        F.col("ut").cast("long").alias("uni_total"),
        F.col("bc").cast("long").alias("bi_clipped"),
        F.col("bt").cast("long").alias("bi_total"),
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(bp * F.exp(0.5 * (F.log(p1) + F.log(p2))), 6).alias("bleu2"),
    )


_MMR_SQL = """
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 300
    ),
    q AS (SELECT v FROM vecs WHERE vec_id = 0),
    rel AS (
      SELECT c.vec_id,
             ROUND(list_dot_product(c.v, q.v)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(q.v, q.v))), 6) AS rel
      FROM vecs c CROSS JOIN q WHERE c.vec_id <> 0
    ),
    cands AS (
      SELECT vec_id, rel FROM (
        SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rk FROM rel
      ) WHERE rk <= 8
    ),
    sims AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ROUND(list_dot_product(va.v, vb.v)
                   / (sqrt(list_dot_product(va.v, va.v))
                      * sqrt(list_dot_product(vb.v, vb.v))), 6) AS sim
      FROM cands a JOIN cands b ON a.vec_id <> b.vec_id
      JOIN vecs va ON va.vec_id = a.vec_id
      JOIN vecs vb ON vb.vec_id = b.vec_id
    ),
    s1 AS (
      SELECT vec_id, rel FROM cands ORDER BY rel DESC, vec_id LIMIT 1
    ),
    r2 AS (
      SELECT c.vec_id, c.rel,
             ROUND(0.7 * c.rel - 0.3 * s.sim, 6) AS score
      FROM cands c
      JOIN sims s ON s.ia = c.vec_id AND s.ib = (SELECT vec_id FROM s1)
      WHERE c.vec_id <> (SELECT vec_id FROM s1)
    ),
    s2 AS (SELECT vec_id, rel, score FROM r2 ORDER BY score DESC, vec_id LIMIT 1),
    r3 AS (
      SELECT c.vec_id, c.rel,
             ROUND(0.7 * c.rel - 0.3 * MAX(s.sim), 6) AS score
      FROM cands c
      JOIN sims s ON s.ia = c.vec_id
        AND s.ib IN ((SELECT vec_id FROM s1), (SELECT vec_id FROM s2))
      WHERE c.vec_id NOT IN ((SELECT vec_id FROM s1), (SELECT vec_id FROM s2))
      GROUP BY c.vec_id, c.rel
    ),
    s3 AS (SELECT vec_id, rel, score FROM r3 ORDER BY score DESC, vec_id LIMIT 1)
    SELECT 1 AS mmr_rank, vec_id, rel, rel AS score FROM s1
    UNION ALL SELECT 2, vec_id, rel, score FROM s2
    UNION ALL SELECT 3, vec_id, rel, score FROM s3
"""


@register("mmr_rerank_embeddings", _MMR_SQL)
def mmr_rerank_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    q = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    rel = (
        vecs.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            "v",
            F.round(
                dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("v"), F.col("v")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                ),
                6,
            ).alias("rel"),
        )
    )
    # top-8 candidate pool: 8-row global window after the scan
    cands = (
        rel.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("rel"), F.asc("vec_id")))
        )
        .filter(F.col("rk") <= 8)
        .select("vec_id", "rel", "v")
    )
    a = cands.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = cands.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    sims = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (
                    F.sqrt(dot(F.col("va"), F.col("va")))
                    * F.sqrt(dot(F.col("vb"), F.col("vb")))
                ),
                6,
            ).alias("sim"),
        )
    )
    pool = cands.select("vec_id", "rel")
    s1 = pool.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1).collect()[0]
    r2 = (
        pool.filter(F.col("vec_id") != s1["vec_id"])
        .join(
            sims.filter(F.col("ib") == s1["vec_id"]).select(
                F.col("ia").alias("vec_id"), "sim"
            ),
            "vec_id",
        )
        .select(
            "vec_id", "rel", F.round(0.7 * F.col("rel") - 0.3 * F.col("sim"), 6).alias("score")
        )
    )
    s2 = r2.orderBy(F.desc("score"), F.asc("vec_id")).limit(1).collect()[0]
    r3 = (
        pool.filter(~F.col("vec_id").isin(s1["vec_id"], s2["vec_id"]))
        .join(
            sims.filter(F.col("ib").isin(s1["vec_id"], s2["vec_id"])).select(
                F.col("ia").alias("vec_id"), "sim"
            ),
            "vec_id",
        )
        .groupBy("vec_id", "rel")
        .agg(F.round(0.7 * F.col("rel") - 0.3 * F.max("sim"), 6).alias("score"))
    )
    s3 = r3.orderBy(F.desc("score"), F.asc("vec_id")).limit(1).collect()[0]
    rows = [
        (1, s1["vec_id"], s1["rel"], s1["rel"]),
        (2, s2["vec_id"], s2["rel"], s2["score"]),
        (3, s3["vec_id"], s3["rel"], s3["score"]),
    ]
    return spark.createDataFrame(
        rows, "mmr_rank int, vec_id long, rel double, score double"
    )
