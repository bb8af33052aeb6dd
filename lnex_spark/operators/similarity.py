"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the correctness baseline. Pure
    built-ins: broadcast the (small) query set, zip_with/aggregate for
    the dot product, window top-k. Exact; O(N*Q) but fully codegen'd
    and embarrassingly parallel — fine when Q is small even at 100 TB.
  * LSH-bucketed top-k — the scale path. Random-hyperplane signatures
    (deterministic seed) via one vectorized numpy UDF, candidate
    generation by signature-bucket join (optionally multi-probe via
    neighboring buckets), exact re-rank of candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):  # Column, Column -> Column
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    embeddings(vec_id, embedding), queries(query_id, embedding) →
    (query_id, vec_id, cosine, rank). Self-matches excluded when ids
    collide."""
    e = embeddings.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("emb_e")
    )
    q = queries.select(
        F.col("query_id"), _as_double(F.col("embedding")).alias("emb_q")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("emb_q"), F.col("emb_e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signatures(embeddings: DataFrame, dim: int, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH signature per vector (one numpy-vectorized
    pandas UDF — Arrow batches, matrix multiply per batch)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("int")
    def sig(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.values).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes.T) > 0  # (batch, n_planes)
        out = np.zeros(len(emb), dtype=np.int32)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int32) << j
        return pd.Series(out)

    return embeddings.withColumn("lsh_sig", sig(F.col("embedding")))


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's LSH
    bucket (single-probe), re-ranked exactly. Recall grows with fewer
    planes / multi-probe; the join is bucket-equi, never all-pairs."""
    e = lsh_signatures(embeddings, dim, n_planes, seed).select(
        "vec_id", F.col("lsh_sig").alias("sig_e"), _as_double(F.col("embedding")).alias("emb_e")
    )
    q = lsh_signatures(queries, dim, n_planes, seed).select(
        F.col("query_id"), F.col("lsh_sig").alias("sig_q"), _as_double(F.col("embedding")).alias("emb_q")
    )
    cand = e.join(F.broadcast(q), F.col("sig_e") == F.col("sig_q")).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "vec_id", F.round(_cosine(F.col("emb_q"), F.col("emb_e")), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties →
    smaller centroid id). centroids(cell_id, embedding) is broadcast —
    the IVF coarse quantizer is always tiny relative to the corpus."""
    e = embeddings.select(id_col, _as_double(F.col("embedding")).alias("emb"))
    c = centroids.select("cell_id", _as_double(F.col("embedding")).alias("cemb"))
    scored = e.crossJoin(F.broadcast(c)).select(
        id_col, "emb", "cell_id", F.round(_cosine(F.col("emb"), F.col("cemb")), 6).alias("csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cell_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "cell_id", "emb")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse centroids (default: the
    first ``n_cells`` vectors by id; pass ``centroids(cell_id,
    embedding)`` from clustering.kmeans_lloyd for trained cells — the
    partition/probe plumbing is identical), vectors bucketed by
    nearest centroid, each query probed against its ``nprobe`` nearest
    cells only, exact cosine re-rank inside.

    Scale shape: the candidate join is an equi-join on cell_id —
    corpus-sized side shuffles ONCE by cell, queries broadcast; no
    all-pairs stage anywhere. Recall grows with nprobe."""
    if centroids is None:
        centroids = (
            embeddings.orderBy("vec_id")
            .limit(n_cells)
            .select(F.col("vec_id").cast("int").alias("cell_id"), "embedding")
        )
    assigned = ivf_assign(embeddings, centroids)  # (vec_id, cell_id, emb)

    q = queries.select("query_id", _as_double(F.col("embedding")).alias("qemb"))
    c = centroids.select("cell_id", _as_double(F.col("embedding")).alias("cemb"))
    qcells = q.crossJoin(F.broadcast(c)).select(
        "query_id", "qemb", "cell_id", F.round(_cosine(F.col("qemb"), F.col("cemb")), 6).alias("csim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cell_id").asc())
    probes = (
        qcells.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "qemb", "cell_id")
    )
    cand = assigned.join(F.broadcast(probes), "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "vec_id", F.round(_cosine(F.col("qemb"), F.col("emb")), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc-level dedup by
    semantic similarity): LSH-bucketed candidates + exact cosine
    filter. Bucket-array pair unrolling, not a self-join — a self-join
    would run the numpy signature UDF twice over the corpus (see
    dedup.lsh_candidate_pairs). Buckets carry the vectors; with
    n_planes=12 the expected bucket is corpus/4096, so the per-bucket
    arrays stay small at scale (and a degenerate bucket is the same
    hazard either way)."""
    dim = len(embeddings.select("embedding").first()[0])
    sigs = lsh_signatures(embeddings, dim).select(
        "vec_id", "lsh_sig", _as_double(F.col("embedding")).alias("emb")
    )
    buckets = (
        sigs.groupBy("lsh_sig")
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "emb"))).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    ps = F.col("ps")
    pairs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps) - i - 1),
                lambda y: F.struct(
                    x["vec_id"].alias("vec_a"),
                    y["vec_id"].alias("vec_b"),
                    F.round(_cosine(x["emb"], y["emb"]), 6).alias("cosine"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.vec_a", "p.vec_b", "p.cosine")
        .filter(F.col("cosine") >= threshold)
    )
