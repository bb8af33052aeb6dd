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


def kmeans_lloyd_arrow(
    embeddings: DataFrame, k: int = 8, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """BLAS/Arrow twin of :func:`kmeans_lloyd` under the SAME
    determinism contract (init = first k by id; assignment = argmin of
    round(sqdist, 6) with cell-id tiebreak; recompute = per-dimension
    mean rounded to 6) — the contract's rounding exists precisely to
    absorb float summation-order differences, which is also what makes
    a numpy kernel substitutable for the Catalyst one.

    Per iteration, MLlib's classic shape:
      * assignment: centroids ride the UDF closure (k x d — quantizer-
        sized by construction); ONE mapInPandas pass computes all
        squared distances per Arrow batch (as summed squared
        differences — see the in-kernel comment on why not the
        Gram-expansion form) and emits per-batch partial
        (cell_id, count, sum-vector) rows. Zero corpus shuffle per
        iteration.
      * recompute: the partials (O(k x batches) tiny rows) aggregate
        with one array zip_with sum; new centroids collect to the
        driver (k rows) for the next closure.

    Returns (centroids(cell_id, cemb), assignment(vec_id, cell_id)),
    like the relational twin. The relational form stays the
    oracle-checked path (kmeans_cells); this is the throughput path
    for quantizer training (semantic dedup / IVF) where
    aggregate(zip_with) lambda interpretation dominates.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    vectors = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("emb"))

    init = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cell_id"),
            F.transform(_as_double(F.col("embedding")), lambda x: F.round(x, 6)).alias("cemb"),
        )
        .collect()
    )
    crows = sorted((int(r["cell_id"]), np.asarray(r["cemb"], dtype=np.float64)) for r in init)

    def _assign_batches(cell_ids: "np.ndarray", C: "np.ndarray", emit_partials: bool):
        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
                # sum of squared DIFFERENCES, same as the relational
                # zip_with form — NOT the |X|^2 - 2XC + |C|^2 expansion,
                # whose cancellation error (~1e-8) moves round(d,6)
                # across boundaries and flips near-tie argmins vs the
                # relational twin (b x k x d temp: ~80 MB at 10k x 16 x
                # 64 — bounded by the Arrow batch size)
                d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
                best = d2.argmin(axis=1)  # first min -> smallest cell_id (C sorted)
                cells = cell_ids[best]
                if not emit_partials:
                    yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell_id": cells})
                    continue
                out = []
                for c in np.unique(cells):
                    m = cells == c
                    out.append((int(c), int(m.sum()), X[m].sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["cell_id", "n", "s"])

        return gen

    # the relational twin returns the assignment made with the
    # centroids ENTERING the last iteration (assign-then-recompute, no
    # re-assign after the final update) — track them for parity
    last_input = None
    for _ in range(iters):
        cell_ids = np.array([c for c, _ in crows], dtype=np.int64)
        C = np.stack([v for _, v in crows])
        last_input = (cell_ids, C)
        partials = vectors.mapInPandas(
            _assign_batches(cell_ids, C, True), "cell_id int, n long, s array<double>"
        )
        merged = partials.groupBy("cell_id").agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("s"),
                F.transform(F.first("s"), lambda _: F.lit(0.0)),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
            ).alias("s"),
        )
        new = merged.select(
            "cell_id",
            F.transform("s", lambda x: F.round(x / F.col("n"), 6)).alias("cemb"),
        ).collect()
        crows = sorted((int(r["cell_id"]), np.asarray(r["cemb"], dtype=np.float64)) for r in new)

    cell_ids, C = last_input
    assignment = vectors.mapInPandas(_assign_batches(cell_ids, C, False), "vec_id long, cell_id int")
    centroids = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in crows], "cell_id int, cemb array<double>"
    )
    return centroids, assignment
