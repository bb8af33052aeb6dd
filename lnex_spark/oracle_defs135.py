"""Hundred-thirty-fifth oracle-registry module: dimensionality
reduction + spatial keys, both md5-deterministic (no engine RNG,
per the split_assign/stratified_sample discipline):

  * random_projection_embeddings — a Johnson-Lindenstrauss ±1
    random projection from the native embedding dimension down to
    k=16, with the sign matrix a pure md5 function of (component,
    dim).  Projects adjacent-id vector pairs and emits the squared-
    distance distortion ratio ||Rx−Ry||²/||x−y||² per pair plus the
    global mean — the measured evidence for "how much cheaper can
    the near-dup pass get before distances lie" (feeds the LSH /
    quantize ops' dimension choices).

  * geohash_cells — base-32 geohash encoding (precision 6 = 30
    interleaved lon/lat bits, lon first) of the deterministic
    customer point cloud used by geo_grid_cells, aggregated to
    per-cell counts + centroids.  The prefix-hierarchical spatial
    partition key (a geohash prefix IS a bounding box, so
    prefix-range scans prune) complementing the fixed 5° grid and
    the Z-order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_K = 16

_RP_SQL = f"""
    WITH vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 101
    ),
    idx AS (
      SELECT vec_id, embedding,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM vecs
    ),
    dims AS (
      SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      FROM idx
    ),
    comps AS (SELECT unnest(range(0, {_K})) AS j),
    signs AS (
      SELECT d.vec_id, d.dim, d.x, c.j,
             CASE WHEN CAST(('0x' || substr(md5('rp' || CAST(c.j AS VARCHAR)
                       || '_' || CAST(d.dim AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM dims d CROSS JOIN comps c
    ),
    proj AS (
      SELECT vec_id, j, SUM(s * x) / sqrt({_K}.0) AS y
      FROM signs GROUP BY vec_id, j
    ),
    pd AS (
      SELECT a.vec_id AS key_a, b.vec_id AS key_b,
             SUM(POW(a.y - b.y, 2)) AS proj_d2
      FROM proj a JOIN proj b
        ON b.vec_id = a.vec_id + 1 AND a.j = b.j
      GROUP BY a.vec_id, b.vec_id
    ),
    od AS (
      SELECT a.vec_id AS key_a, b.vec_id AS key_b,
             SUM(POW(a.x - b.x, 2)) AS orig_d2
      FROM dims a JOIN dims b
        ON b.vec_id = a.vec_id + 1 AND a.dim = b.dim
      GROUP BY a.vec_id, b.vec_id
    ),
    pairs AS (
      SELECT pd.key_a, pd.key_b,
             ROUND(od.orig_d2, 6) AS orig_d2,
             ROUND(pd.proj_d2, 6) AS proj_d2,
             pd.proj_d2 / od.orig_d2 AS ratio
      FROM pd JOIN od ON pd.key_a = od.key_a AND od.orig_d2 > 0
    ),
    summary AS (SELECT ROUND(AVG(ratio), 6) AS mean_ratio FROM pairs)
    SELECT p.key_a, p.key_b, p.orig_d2, p.proj_d2,
           ROUND(p.ratio, 6) AS ratio, s.mean_ratio
    FROM pairs p CROSS JOIN summary s
"""


@register("random_projection_embeddings", _RP_SQL)
def random_projection_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 101)
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    comps = spark.createDataFrame([(j,) for j in range(_K)], ["j"])
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rp"),
                        F.col("j").cast("string"),
                        F.lit("_"),
                        F.col("dim").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        1.0,
    ).otherwise(-1.0)
    proj = (
        dims.crossJoin(F.broadcast(comps))
        .select("vec_id", "j", (sign * F.col("x")).alias("sx"))
        .groupBy("vec_id", "j")
        .agg((F.sum("sx") / float(_K) ** 0.5).alias("y"))
    )
    pa = proj.select(F.col("vec_id").alias("key_a"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("kb"), "j", F.col("y").alias("yb"))
    pd_ = (
        pa.join(pb, (F.col("kb") == F.col("key_a") + 1) & (pa.j == pb.j))
        .groupBy("key_a", F.col("kb").alias("key_b"))
        .agg(F.sum(F.pow(F.col("ya") - F.col("yb"), 2)).alias("proj_d2"))
    )
    da = dims.select(F.col("vec_id").alias("key_a"), "dim", F.col("x").alias("xa"))
    db = dims.select(F.col("vec_id").alias("kb"), "dim", F.col("x").alias("xb"))
    od = (
        da.join(db, (F.col("kb") == F.col("key_a") + 1) & (da.dim == db.dim))
        .groupBy("key_a")
        .agg(F.sum(F.pow(F.col("xa") - F.col("xb"), 2)).alias("orig_d2"))
    )
    pairs = pd_.join(od, "key_a").filter(F.col("orig_d2") > 0).select(
        "key_a",
        "key_b",
        F.round("orig_d2", 6).alias("orig_d2"),
        F.round("proj_d2", 6).alias("proj_d2"),
        (F.col("proj_d2") / F.col("orig_d2")).alias("ratio_raw"),
    )
    summary = pairs.agg(F.round(F.avg("ratio_raw"), 6).alias("mean_ratio"))
    return pairs.crossJoin(F.broadcast(summary)).select(
        "key_a",
        "key_b",
        "orig_d2",
        "proj_d2",
        F.round("ratio_raw", 6).alias("ratio"),
        "mean_ratio",
    )


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_char_sql(i: int) -> str:
    shift = 2 ** (25 - 5 * i)
    return f"substr('{_B32}', CAST((v // {shift}) % 32 + 1 AS INT), 1)"


_GH_SQL = f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 180) - 90 + 0.5 AS lat,
             (c_custkey % 360) - 180 + 0.5 AS lon
      FROM customer
    ),
    bits AS (
      SELECT c_custkey, lat, lon, unnest(range(0, 30)) AS t
      FROM pts
    ),
    valued AS (
      SELECT c_custkey, lat, lon,
             SUM((CASE WHEN t % 2 = 0
                  THEN CAST(floor((lon + 180) / 360.0
                       * POW(2, t // 2 + 1)) AS BIGINT) % 2
                  ELSE CAST(floor((lat + 90) / 180.0
                       * POW(2, (t - 1) // 2 + 1)) AS BIGINT) % 2
                  END) * CAST(POW(2, 29 - t) AS BIGINT)) AS v
      FROM bits GROUP BY c_custkey, lat, lon
    )
    SELECT {" || ".join(_gh_char_sql(i) for i in range(6))} AS geohash,
           COUNT(*) AS n,
           ROUND(AVG(lat), 6) AS centroid_lat,
           ROUND(AVG(lon), 6) AS centroid_lon
    FROM valued GROUP BY 1
"""


@register("geohash_cells", _GH_SQL)
def geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180) - 90 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.5).alias("lon"),
    )
    bits = pts.select(
        "c_custkey", "lat", "lon", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("t")
    )
    lon_bit = (
        F.floor(
            (F.col("lon") + 180) / 360.0
            * F.pow(F.lit(2.0), (F.col("t") / 2).cast("int") + 1)
        ).cast("long")
        % 2
    )
    lat_bit = (
        F.floor(
            (F.col("lat") + 90) / 180.0
            * F.pow(F.lit(2.0), ((F.col("t") - 1) / 2).cast("int") + 1)
        ).cast("long")
        % 2
    )
    valued = bits.groupBy("c_custkey", "lat", "lon").agg(
        F.sum(
            F.when(F.col("t") % 2 == 0, lon_bit).otherwise(lat_bit)
            * F.pow(F.lit(2.0), 29 - F.col("t")).cast("long")
        ).alias("v")
    )
    gh = F.concat(
        *[
            F.expr(
                f"substr('{_B32}', CAST((v DIV {2 ** (25 - 5 * i)}) % 32 + 1"
                " AS INT), 1)"
            )
            for i in range(6)
        ]
    )
    return valued.groupBy(gh.alias("geohash")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("lat"), 6).alias("centroid_lat"),
        F.round(F.avg("lon"), 6).alias("centroid_lon"),
    )
