"""Hundred-thirty-second oracle-registry module: embedding-space
diagnostics — the two readouts that tell you whether a vector space
is healthy BEFORE you build an ANN index over it:

  * hubness_embeddings — the k-occurrence distribution: how many
    times each vector appears in other vectors' cosine top-5.  High
    hubness (a few vectors that are "everyone's neighbor") is the
    classic high-dimensional pathology that silently degrades ANN
    recall and dedup quality.  Emits the histogram of N_5 values
    (including the 0-occurrence antihubs via a left join) with the
    global skewness g1 = m3/m2^1.5 of N_5 alongside — skew >> 0 is
    the hubness alarm.  Same bounded pairwise-cosine shape as
    ann_cosine_topk (vec_id < 300 → 90k pairs).

  * davies_bouldin_embeddings — the Davies-Bouldin cluster-validity
    index over the given label column: per-label centroids (rounded
    per the iterative-solver discipline), within-cluster mean
    distance S_i, centroid separations M_ij, R_ij = (S_i+S_j)/M_ij,
    DB = mean_i max_{j≠i} R_ij.  The internal clustering quality
    score complementing silhouette_embeddings (which samples; this
    one is exact per label).  Lower is better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HUB_SQL = """
    WITH vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    ),
    pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS vid,
             a.embedding AS ea, b.embedding AS eb
      FROM vecs a JOIN vecs b ON a.vec_id != b.vec_id
    ),
    flat AS (
      SELECT qid, vid, unnest(ea) AS x, unnest(eb) AS y FROM pairs
    ),
    dots AS (
      SELECT qid, vid,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nx,
             sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) AS ny
      FROM flat GROUP BY qid, vid
    ),
    ranked AS (
      SELECT qid, vid,
             row_number() OVER (PARTITION BY qid
                 ORDER BY ROUND(dot / greatest(nx * ny, 1e-300), 6) DESC, vid ASC) AS rk
      FROM dots
    ),
    occ AS (
      SELECT v.vec_id,
             COALESCE(k.nk, 0) AS nk
      FROM vecs v LEFT JOIN (
        SELECT vid, COUNT(*) AS nk FROM ranked WHERE rk <= 5 GROUP BY vid
      ) k ON v.vec_id = k.vid
    ),
    mom AS (
      SELECT AVG(nk) AS mu,
             AVG(POW(nk - (SELECT AVG(nk) FROM occ), 2)) AS m2,
             AVG(POW(nk - (SELECT AVG(nk) FROM occ), 3)) AS m3
      FROM occ
    )
    SELECT o.nk AS k_occurrence,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND((SELECT m3 / POW(m2, 1.5) FROM mom), 6) AS skew_g1
    FROM occ o GROUP BY o.nk
"""


@register("hubness_embeddings", _HUB_SQL)
def hubness_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    vecs = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    a = vecs.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("ea"))
    b = vecs.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("qid") != F.col("vid"))
    flat = pairs.select(
        "qid", "vid", F.posexplode(F.arrays_zip("ea", "eb")).alias("i", "xy")
    ).select(
        "qid",
        "vid",
        F.col("xy.ea").cast("double").alias("x"),
        F.col("xy.eb").cast("double").alias("y"),
    )
    dots = flat.groupBy("qid", "vid").agg(
        F.sum(F.col("x") * F.col("y")).alias("dot"),
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nx"),
        F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("ny"),
    )
    win = Window.partitionBy("qid").orderBy(
        F.round(F.col("dot") / (F.col("nx") * F.col("ny")), 6).desc(),
        F.asc("vid"),
    )
    topk = (
        dots.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 5)
        .groupBy("vid")
        .agg(F.count("*").alias("nk_raw"))
    )
    occ = vecs.select("vec_id").join(
        topk.withColumnRenamed("vid", "vec_id"), "vec_id", "left"
    ).select(F.coalesce("nk_raw", F.lit(0)).alias("nk"))
    mu = occ.agg(F.avg("nk").alias("mu"))
    mom = occ.crossJoin(F.broadcast(mu)).agg(
        F.avg(F.pow(F.col("nk") - F.col("mu"), 2)).alias("m2"),
        F.avg(F.pow(F.col("nk") - F.col("mu"), 3)).alias("m3"),
    )
    skew = mom.select(
        F.round(F.col("m3") / F.pow("m2", 1.5), 6).alias("skew_g1")
    )
    return (
        occ.groupBy(F.col("nk").alias("k_occurrence"))
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .crossJoin(F.broadcast(skew))
    )


_DB_SQL = """
    WITH idx AS (
      SELECT vec_id, label, embedding,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings
    ),
    dims AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM idx
    ),
    cent AS (
      SELECT label, dim, ROUND(AVG(x), 6) AS c
      FROM dims GROUP BY label, dim
    ),
    within AS (
      SELECT d.label, d.vec_id,
             sqrt(SUM(POW(d.x - c.c, 2))) AS dist
      FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
      GROUP BY d.label, d.vec_id
    ),
    s AS (
      SELECT label, COUNT(*) AS n, ROUND(AVG(dist), 6) AS s_i
      FROM within GROUP BY label
    ),
    m AS (
      SELECT a.label AS li, b.label AS lj,
             sqrt(SUM(POW(a.c - b.c, 2))) AS m_ij
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label != b.label
      GROUP BY a.label, b.label
    ),
    r AS (
      SELECT m.li AS label, MAX((si.s_i + sj.s_i) / m.m_ij) AS d_i
      FROM m
      JOIN s si ON si.label = m.li
      JOIN s sj ON sj.label = m.lj
      GROUP BY m.li
    ),
    db AS (SELECT ROUND(AVG(d_i), 6) AS db_index FROM r)
    SELECT s.label, CAST(s.n AS BIGINT) AS n, s.s_i,
           ROUND(r.d_i, 6) AS d_i,
           db.db_index
    FROM s JOIN r ON s.label = r.label CROSS JOIN db
"""


@register("davies_bouldin_embeddings", _DB_SQL)
def davies_bouldin_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "label", "dim", F.col("xf").cast("double").alias("x"))
    cent = dims.groupBy("label", "dim").agg(
        F.round(F.avg("x"), 6).alias("c")
    )
    within = (
        dims.join(cent, ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(F.sqrt(F.sum(F.pow(F.col("x") - F.col("c"), 2))).alias("dist"))
    )
    s = within.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("dist"), 6).alias("s_i"),
    )
    ca = cent.select(
        F.col("label").alias("li"), "dim", F.col("c").alias("cx")
    )
    cb = cent.select(
        F.col("label").alias("lj"), "dim", F.col("c").alias("cy")
    )
    m = (
        ca.join(cb, (ca.dim == cb.dim) & (F.col("li") != F.col("lj")))
        .groupBy("li", "lj")
        .agg(F.sqrt(F.sum(F.pow(F.col("cx") - F.col("cy"), 2))).alias("m_ij"))
    )
    si = s.select(F.col("label").alias("li"), F.col("s_i").alias("sa"))
    sj = s.select(F.col("label").alias("lj"), F.col("s_i").alias("sb"))
    r = (
        m.join(F.broadcast(si), "li")
        .join(F.broadcast(sj), "lj")
        .groupBy(F.col("li").alias("label"))
        .agg(F.max((F.col("sa") + F.col("sb")) / F.col("m_ij")).alias("d_i"))
    )
    db = r.agg(F.round(F.avg("d_i"), 6).alias("db_index"))
    return (
        s.join(r, "label")
        .crossJoin(F.broadcast(db))
        .select("label", "n", "s_i", F.round("d_i", 6).alias("d_i"), "db_index")
    )
