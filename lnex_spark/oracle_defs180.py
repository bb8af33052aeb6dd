"""Hundred-eightieth oracle-registry module: clusterability and
split-stability diagnostics over the 64-d embeddings table — the
pre-flight checks before anyone trusts kmeans_cells or
silhouette_embeddings.

  * hopkins_embeddings — Hopkins clustering-tendency statistic:
    50 real probes (vec_id % 10 = 0) vs 50 SYNTHETIC probes drawn
    uniformly inside the per-dimension bounding box by md5-hash
    fractions (deterministic, identical in both engines), each
    probe's nearest-neighbor Euclidean distance to the real cloud
    (self excluded for real probes) computed at the (probe, point,
    dim) grain — a bounded 50 x 500 x 64 join.  H = sum(u) /
    (sum(u) + sum(w)) ≈ 0.5 → uniform (don't cluster), → 1 →
    strongly clustered.

  * centroid_shift_embeddings — per-label centroid L2 shift between
    the even-vec_id and odd-vec_id halves, with the half sizes and
    the label's overall within-half dispersion for scale: shift <<
    dispersion → the label's centroid estimate is stable under
    resampling; large ratios flag labels whose "cluster" is an
    artifact of a few points.  The split-half reliability test for
    embedding-space structure, sharing its dense (label, dim) rollup
    with label_centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HOPKINS_SQL = """
    WITH pts AS (
      SELECT vec_id, d - 1 AS d, CAST(embedding[d] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(d)
    ),
    box AS (
      SELECT d, ROUND(MIN(x), 6) AS lo, ROUND(MAX(x), 6) AS hi
      FROM pts GROUP BY d
    ),
    synth AS (
      SELECT p.p, b.d,
             b.lo + (b.hi - b.lo)
               * (CAST(('0x' || substr(md5('hop#' || CAST(p.p AS VARCHAR)
                        || '/' || CAST(b.d AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0) AS x
      FROM (SELECT UNNEST(range(0, 50)) AS p) p CROSS JOIN box b
    ),
    u_d2 AS (
      SELECT s.p, pt.vec_id, SUM((s.x - pt.x) * (s.x - pt.x)) AS d2
      FROM synth s JOIN pts pt ON pt.d = s.d
      GROUP BY s.p, pt.vec_id
    ),
    u AS (SELECT p, SQRT(MIN(d2)) AS u FROM u_d2 GROUP BY p),
    rprobe AS (SELECT vec_id AS p FROM embeddings WHERE vec_id % 10 = 0),
    w_d2 AS (
      SELECT rp.p, pt.vec_id, SUM((pp.x - pt.x) * (pp.x - pt.x)) AS d2
      FROM rprobe rp
      JOIN pts pp ON pp.vec_id = rp.p
      JOIN pts pt ON pt.d = pp.d AND pt.vec_id <> rp.p
      GROUP BY rp.p, pt.vec_id
    ),
    w AS (SELECT p, SQRT(MIN(d2)) AS w FROM w_d2 GROUP BY p),
    agg AS (
      SELECT (SELECT SUM(u) FROM u) AS su, (SELECT SUM(w) FROM w) AS sw
    )
    SELECT ROUND(su, 6) AS sum_u, ROUND(sw, 6) AS sum_w,
           ROUND(su / (su + sw), 6) AS hopkins_h
    FROM agg
"""


@register("hopkins_embeddings", _HOPKINS_SQL)
def hopkins_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x0")
    ).select("vec_id", "d", F.col("x0").cast("double").alias("x"))
    box = pts.groupBy("d").agg(
        F.round(F.min("x"), 6).alias("lo"),
        F.round(F.max("x"), 6).alias("hi"),
    )
    probes = emb.sparkSession.range(0, 50).select(F.col("id").alias("p"))
    frac = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hop#"),
                        F.col("p").cast("string"),
                        F.lit("/"),
                        F.col("d").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / 4294967296.0
    )
    synth = probes.crossJoin(F.broadcast(box)).select(
        "p",
        "d",
        (F.col("lo") + (F.col("hi") - F.col("lo")) * frac).alias("x"),
    )
    ptsr = pts.select(
        F.col("vec_id"), F.col("d").alias("dd"), F.col("x").alias("xr")
    )
    u_d2 = (
        synth.join(ptsr, F.col("dd") == F.col("d"))
        .groupBy("p", "vec_id")
        .agg(
            F.sum(
                (F.col("x") - F.col("xr")) * (F.col("x") - F.col("xr"))
            ).alias("d2")
        )
    )
    u = u_d2.groupBy("p").agg(F.sqrt(F.min("d2")).alias("u"))
    rprobe = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("p")
    )
    pp = pts.select(
        F.col("vec_id").alias("p"), F.col("d").alias("dp"), F.col("x").alias("xp")
    )
    w_d2 = (
        rprobe.join(pp, "p")
        .join(
            ptsr,
            (F.col("dd") == F.col("dp")) & (F.col("vec_id") != F.col("p")),
        )
        .groupBy("p", "vec_id")
        .agg(
            F.sum(
                (F.col("xp") - F.col("xr")) * (F.col("xp") - F.col("xr"))
            ).alias("d2")
        )
    )
    w = w_d2.groupBy("p").agg(F.sqrt(F.min("d2")).alias("w"))
    su = u.agg(F.sum("u").alias("su"))
    sw = w.agg(F.sum("w").alias("sw"))
    return su.crossJoin(F.broadcast(sw)).select(
        F.round("su", 6).alias("sum_u"),
        F.round("sw", 6).alias("sum_w"),
        F.round(F.col("su") / (F.col("su") + F.col("sw")), 6).alias(
            "hopkins_h"
        ),
    )


_SHIFT_SQL = """
    WITH pts AS (
      SELECT label, vec_id % 2 AS half, vec_id, d - 1 AS d,
             CAST(embedding[d] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(d)
    ),
    cent AS (
      SELECT label, half, d, AVG(x) AS c, COUNT(DISTINCT vec_id) AS n
      FROM pts GROUP BY label, half, d
    ),
    shift AS (
      SELECT a.label,
             MAX(a.n) AS n_even, MAX(b.n) AS n_odd,
             SQRT(SUM((a.c - b.c) * (a.c - b.c))) AS shift
      FROM cent a JOIN cent b
        ON a.label = b.label AND a.d = b.d AND a.half = 0 AND b.half = 1
      GROUP BY a.label
    ),
    disp AS (
      SELECT p.label, SQRT(AVG((p.x - c.c) * (p.x - c.c)) * 64) AS rms
      FROM pts p JOIN cent c
        ON c.label = p.label AND c.half = p.half AND c.d = p.d
      GROUP BY p.label
    )
    SELECT s.label, CAST(s.n_even AS BIGINT) AS n_even,
           CAST(s.n_odd AS BIGINT) AS n_odd,
           ROUND(s.shift, 6) AS centroid_shift,
           ROUND(d.rms, 6) AS rms_dispersion,
           ROUND(s.shift / d.rms, 6) AS shift_ratio
    FROM shift s JOIN disp d ON d.label = s.label
    ORDER BY s.label
"""


@register("centroid_shift_embeddings", _SHIFT_SQL)
def centroid_shift_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        "vec_id",
        F.posexplode("embedding").alias("d", "x0"),
    ).withColumn("x", F.col("x0").cast("double"))
    cent = pts.groupBy("label", "half", "d").agg(
        F.avg("x").alias("c"), F.countDistinct("vec_id").alias("n")
    )
    a = cent.where(F.col("half") == 0).select(
        "label", "d", F.col("c").alias("ca"), F.col("n").alias("na")
    )
    b = cent.where(F.col("half") == 1).select(
        "label", "d", F.col("c").alias("cb"), F.col("n").alias("nb")
    )
    shift = (
        a.join(b, ["label", "d"])
        .groupBy("label")
        .agg(
            F.max("na").alias("n_even"),
            F.max("nb").alias("n_odd"),
            F.sqrt(
                F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            ).alias("shift"),
        )
    )
    disp = (
        pts.join(cent, ["label", "half", "d"])
        .groupBy("label")
        .agg(
            F.sqrt(
                F.avg((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
                * 64
            ).alias("rms")
        )
    )
    return (
        shift.join(disp, "label")
        .select(
            "label",
            F.col("n_even").cast("long").alias("n_even"),
            F.col("n_odd").cast("long").alias("n_odd"),
            F.round("shift", 6).alias("centroid_shift"),
            F.round("rms", 6).alias("rms_dispersion"),
            F.round(F.col("shift") / F.col("rms"), 6).alias("shift_ratio"),
        )
        .orderBy("label")
    )
