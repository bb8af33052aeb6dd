"""Deterministic Lloyd's k-means over an embedding column — the
iterative-algorithm workload class (coarse quantizer training for the
IVF index in similarity.py, cluster-balance profiling for partition
planning).

Determinism contract (what makes this testable AND resumable):
  * init = the first k vectors by id (swap for k-means|| on a real
    corpus; the iteration plumbing is identical),
  * assignment = argmin squared-euclidean with distances rounded to 6
    decimals and cell-id tiebreak, so the argmin is reproducible
    across engines and partitionings,
  * centroid recompute = per-dimension mean, rounded to 6 decimals
    each iteration — absorbs float summation-order nondeterminism
    (grouped avg over doubles is not bit-stable across partitionings).

Scale shape per iteration: one broadcast of k×dim centroids, one
crossJoin + min_by aggregation (partial+final) for assignment, one
posexplode + two hash aggs for the recompute. No driver-side data,
no window functions; the Python loop only stitches DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lnex_spark.operators.similarity import _as_double


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, emb) x (cell_id, cemb) -> (vec_id, cell_id, emb)."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "emb",
        "cell_id",
        F.round(_sqdist(F.col("emb"), F.col("cemb")), 6).alias("d"),
    )
    picked = scored.groupBy("vec_id").agg(
        F.min_by(
            F.struct("cell_id", "emb"), F.struct(F.col("d"), F.col("cell_id"))
        ).alias("_best")
    )
    return picked.select("vec_id", F.col("_best.cell_id").alias("cell_id"), F.col("_best.emb").alias("emb"))


def _recompute(assigned: DataFrame) -> DataFrame:
    """Per-cell, per-dimension mean -> (cell_id, cemb), rounded."""
    dims = assigned.select("cell_id", F.posexplode("emb").alias("i", "v"))
    means = dims.groupBy("cell_id", "i").agg(F.round(F.avg("v"), 6).alias("m"))
    return means.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("cemb")
    )


def kmeans_lloyd(
    embeddings: DataFrame, k: int = 8, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids(cell_id, cemb), assignment(vec_id, cell_id))
    after ``iters`` Lloyd iterations."""
    vectors = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cell_id"),
            F.transform(_as_double(F.col("embedding")), lambda x: F.round(x, 6)).alias("cemb"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign(vectors, centroids)
        centroids = _recompute(assigned)
    return centroids, assigned.select("vec_id", "cell_id")
