"""Hundred-eighty-eighth oracle-registry module: modern vector-search
scoring patterns on the embeddings table — the late-interaction and
dimension-truncation tricks production retrieval stacks actually use.

  * late_interaction_embeddings — ColBERT-style MaxSim between
    adjacent vectors (vec_id % 10 = 0 paired with +1): each 64-d
    vector is treated as 8 sub-vectors of 8 dims ("token"
    embeddings), score = sum over query sub-vectors of the max
    cosine against any document sub-vector, computed entirely at the
    (pair, sub_q, sub_d, dim) grain with groupBy rollups — no UDF.
    Late interaction preserves local structure that single-vector
    cosine averages away; emitted next to the flat cosine for the
    comparison.

  * matryoshka_embeddings — Matryoshka-truncation fidelity: cosine
    between the same adjacent pairs using only the first 8, 16, 32,
    then all 64 dimensions, plus per-prefix the mean absolute
    deviation from the full-dim cosine across pairs.  The readout
    that says which truncated dimension a first-stage retriever can
    run at — the storage/recall trade every ANN index at 10^12 scale
    must make (cross-check: quantize_embeddings does the same for
    bit depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PAIR_PTS = """
    pairs AS (
      SELECT a.vec_id AS ka, b.vec_id AS kb,
             a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 10 = 0
    ),
    dims AS (
      SELECT p.ka, p.kb, d - 1 AS d,
             CAST(p.ea[d] AS DOUBLE) AS xa, CAST(p.eb[d] AS DOUBLE) AS xb
      FROM pairs p, UNNEST(range(1, 65)) AS t(d)
    )"""


_LATE_SQL = f"""
    WITH {_PAIR_PTS},
    subs AS (
      SELECT ka, kb, CAST(FLOOR(d / 8) AS INTEGER) AS sq, d % 8 AS dd,
             xa, xb
      FROM dims
    ),
    qv AS (
      SELECT ka, sq, dd, xa FROM subs
    ),
    dv AS (
      SELECT ka, sq AS sd, dd, xb FROM subs
    ),
    dots AS (
      SELECT q.ka, q.sq, d.sd,
             SUM(q.xa * d.xb) AS dot,
             SQRT(SUM(q.xa * q.xa)) AS na,
             SQRT(SUM(d.xb * d.xb)) AS nb
      FROM qv q JOIN dv d ON d.ka = q.ka AND d.dd = q.dd
      GROUP BY q.ka, q.sq, d.sd
    ),
    best AS (
      SELECT ka, sq, MAX(dot / (na * nb)) AS ms
      FROM dots GROUP BY ka, sq
    ),
    maxsim AS (
      SELECT ka, SUM(ms) AS maxsim FROM best GROUP BY ka
    ),
    flat AS (
      SELECT ka,
             SUM(xa * xb) / (SQRT(SUM(xa * xa)) * SQRT(SUM(xb * xb)))
               AS cos
      FROM dims GROUP BY ka
    )
    SELECT m.ka AS vec_a,
           ROUND(m.maxsim, 6) AS maxsim_8x8,
           ROUND(f.cos, 6) AS flat_cosine
    FROM maxsim m JOIN flat f ON f.ka = m.ka
    ORDER BY vec_a
"""


@register("late_interaction_embeddings", _LATE_SQL)
def late_interaction_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("ka"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("kb"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, F.col("kb") == F.col("ka") + 1)
    dims = pairs.select(
        "ka",
        F.posexplode(
            F.arrays_zip(F.col("ea"), F.col("eb"))
        ).alias("d", "z"),
    ).select(
        "ka",
        "d",
        F.col("z.ea").cast("double").alias("xa"),
        F.col("z.eb").cast("double").alias("xb"),
    )
    subs = dims.select(
        "ka",
        (F.col("d") / 8).cast("int").alias("sq"),
        (F.col("d") % 8).alias("dd"),
        "xa",
        "xb",
    )
    qv = subs.select("ka", "sq", "dd", "xa")
    dv = subs.select("ka", F.col("sq").alias("sd"), "dd", "xb")
    dots = (
        qv.join(dv, ["ka", "dd"])
        .groupBy("ka", "sq", "sd")
        .agg(
            F.sum(F.col("xa") * F.col("xb")).alias("dot"),
            F.sqrt(F.sum(F.col("xa") * F.col("xa"))).alias("na"),
            F.sqrt(F.sum(F.col("xb") * F.col("xb"))).alias("nb"),
        )
    )
    best = dots.groupBy("ka", "sq").agg(
        F.max(F.col("dot") / (F.col("na") * F.col("nb"))).alias("ms")
    )
    maxsim = best.groupBy("ka").agg(F.sum("ms").alias("maxsim"))
    flat = dims.groupBy("ka").agg(
        (
            F.sum(F.col("xa") * F.col("xb"))
            / (
                F.sqrt(F.sum(F.col("xa") * F.col("xa")))
                * F.sqrt(F.sum(F.col("xb") * F.col("xb")))
            )
        ).alias("cos")
    )
    return (
        maxsim.join(flat, "ka")
        .select(
            F.col("ka").alias("vec_a"),
            F.round("maxsim", 6).alias("maxsim_8x8"),
            F.round("cos", 6).alias("flat_cosine"),
        )
        .orderBy("vec_a")
    )


_MATRYOSHKA_SQL = f"""
    WITH {_PAIR_PTS},
    prefixes AS (SELECT UNNEST([8, 16, 32, 64]) AS p),
    cosp AS (
      SELECT d.ka, pr.p,
             SUM(d.xa * d.xb)
               / (SQRT(SUM(d.xa * d.xa)) * SQRT(SUM(d.xb * d.xb))) AS cos
      FROM dims d JOIN prefixes pr ON d.d < pr.p
      GROUP BY d.ka, pr.p
    ),
    full_cos AS (
      SELECT ka, cos AS fcos FROM cosp WHERE p = 64
    )
    SELECT c.p AS prefix_dims,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(c.cos), 6) AS mean_cosine,
           ROUND(AVG(ABS(c.cos - f.fcos)), 6) AS mad_vs_full
    FROM cosp c JOIN full_cos f ON f.ka = c.ka
    GROUP BY c.p
    ORDER BY prefix_dims
"""


@register("matryoshka_embeddings", _MATRYOSHKA_SQL)
def matryoshka_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("ka"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("kb"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, F.col("kb") == F.col("ka") + 1)
    dims = pairs.select(
        "ka",
        F.posexplode(F.arrays_zip(F.col("ea"), F.col("eb"))).alias("d", "z"),
    ).select(
        "ka",
        "d",
        F.col("z.ea").cast("double").alias("xa"),
        F.col("z.eb").cast("double").alias("xb"),
    )
    prefixes = emb.sparkSession.createDataFrame(
        [(8,), (16,), (32,), (64,)], "p int"
    )
    cosp = (
        dims.join(F.broadcast(prefixes), F.col("d") < F.col("p"))
        .groupBy("ka", "p")
        .agg(
            (
                F.sum(F.col("xa") * F.col("xb"))
                / (
                    F.sqrt(F.sum(F.col("xa") * F.col("xa")))
                    * F.sqrt(F.sum(F.col("xb") * F.col("xb")))
                )
            ).alias("cos")
        )
    )
    full_cos = cosp.where(F.col("p") == 64).select(
        "ka", F.col("cos").alias("fcos")
    )
    return (
        cosp.join(full_cos, "ka")
        .groupBy("p")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("cos"), 6).alias("mean_cosine"),
            F.round(F.avg(F.abs(F.col("cos") - F.col("fcos"))), 6).alias(
                "mad_vs_full"
            ),
        )
        .select(
            F.col("p").alias("prefix_dims"),
            "n_pairs",
            "mean_cosine",
            "mad_vs_full",
        )
        .orderBy("prefix_dims")
    )
