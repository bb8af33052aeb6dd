"""ANN quality/latency curves at scale (VERDICT r04 item 5).

``ann_recall_at_k`` verifies the recall COMPUTATION as an oracle op;
what was missing is the measured operating curve: recall@k and wall
latency for each index family vs the exact baseline on a corpus big
enough that index structure matters.  This tool synthesizes a
deterministic clustered corpus (no external data, per the round
brief), computes exact ground truth with the BLAS brute-force twin,
then sweeps:

  lsh         Rademacher hyperplane LSH, single- and multi-probe
  ivf         trained-kmeans IVF, nprobe ladder (the relational /
              SQL-oracle form — interpreted-lambda scoring, so its
              local wall is an upper bound, not the scale story)
  ivf_pruned  the SCALE path: cell-partitioned index (write_ivf_index)
              + partition-pruned BLAS scan — result-identical to ivf,
              reads only nprobe/n_cells of the files
  ivf_pq      IVF + product-quantized ADC re-rank (compressed path);
              _trained = per-subspace k-means codebook

Per configuration prints one JSON line:
  {"index": "ivf", "params": {...}, "recall_at_k": 0.93,
   "wall_sec": 1.84, "candidates_per_query": ...}

Corpus model — near-dup families, the retrieval structure a curation
corpus actually has (semantic-dedup's target): vectors come in
families of FAMILY (=16) siblings; family base = cluster center +
0.3*family noise, member = base + 0.08*member noise, all rng streams
keyed by id block so generation is deterministic under any
partitioning.  A query is a member + 0.05 perturbation, so its exact
top-10 is (essentially) its 15 siblings — an index earns recall by
finding the family, which is the operation that matters, instead of
ranking statistically-indistinguishable cluster-mates.

Usage:
    python tools/ann_quality_bench.py [n_vectors] [--dim 64] \
        [--queries 100] [--k 10] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BLOCK = 4096  # rows per rng stream — id//BLOCK seeds the generator
FAMILY = 16   # near-dup family size: exact top-(FAMILY-1) = siblings


def synth_corpus(spark, n: int, dim: int, n_clusters: int, cpus: int):
    """(vec_id, embedding) DataFrame: near-dup families inside a
    Gaussian cluster mixture, deterministic per vec_id regardless of
    partitioning (every rng stream is keyed by an id block and indexed
    by offset, so a block straddling a partition boundary still gives
    each row the same noise)."""
    centers = np.stack(
        [np.random.default_rng(1000 + c).standard_normal(dim) for c in range(n_clusters)]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            fams = ids // FAMILY
            base = np.empty((len(ids), dim))
            for fblk in np.unique(fams // BLOCK):
                m = (fams // BLOCK) == fblk
                rng = np.random.default_rng(int(1_000_000_000 + fblk))
                fnoise = rng.standard_normal((BLOCK, dim))
                base[m] = centers[fams[m] % n_clusters] + 0.3 * fnoise[fams[m] % BLOCK]
            out = np.empty((len(ids), dim))
            for blk in np.unique(ids // BLOCK):
                m = (ids // BLOCK) == blk
                rng = np.random.default_rng(int(blk))
                noise = rng.standard_normal((BLOCK, dim))
                out[m] = base[m] + 0.08 * noise[ids[m] % BLOCK]
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return (
        spark.range(0, n, 1, cpus * 2)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_vectors", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--clusters", type=int, default=256)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lnex_spark.operators.clustering import kmeans_lloyd_arrow
    from lnex_spark.operators.similarity import (
        ann_ivfpq_topk,
        cosine_topk_bruteforce_arrow,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )
    from lnex_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="ann_quality_bench",
        shuffle_partitions=args.cpus,
    )
    emb = synth_corpus(spark, args.n_vectors, args.dim, args.clusters, args.cpus).persist()
    n = emb.count()

    # queries: every 1/Q-th corpus vector, perturbed (rng stream 7)
    stride = max(1, n // args.queries)
    # sort before consuming the perturbation rng stream: collect()
    # order depends on partitioning, and a sequential rng consumed in
    # collect order would make the query set (hence every recall
    # number) vary with --cpus
    qrows = sorted(
        emb.filter(
            (F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * args.queries)
        ).collect(),
        key=lambda r: int(r["vec_id"]),
    )
    rngq = np.random.default_rng(7)
    qdata = [
        (
            int(r["vec_id"]),
            [float(x) for x in np.asarray(r["embedding"]) + 0.05 * rngq.standard_normal(args.dim)],
        )
        for r in qrows
    ]
    q = spark.createDataFrame(qdata, "query_id long, embedding array<double>").persist()
    q.count()

    def truth_and_time(df, name, params):
        t0 = time.monotonic()
        rows = df.collect()
        dt = time.monotonic() - t0
        res: dict[int, set[int]] = {}
        for r in rows:
            res.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        return res, dt, rows

    exact, t_exact, _ = truth_and_time(
        cosine_topk_bruteforce_arrow(emb, q, k=args.k), "exact", {}
    )
    print(
        json.dumps(
            {"index": "bruteforce_arrow", "params": {"k": args.k},
             "recall_at_k": 1.0, "wall_sec": round(t_exact, 2), "n_vectors": n}
        ),
        flush=True,
    )

    def recall(approx: dict[int, set[int]]) -> float:
        num = sum(len(approx.get(qid, set()) & hits) for qid, hits in exact.items())
        den = sum(len(hits) for hits in exact.values())
        return round(num / den, 4) if den else 0.0

    # trained coarse quantizer, shared by ivf and ivf_pq
    t0 = time.monotonic()
    cents_df, _ = kmeans_lloyd_arrow(emb, k=args.clusters // 4, iters=2)
    cent_rows = [
        (int(r["cell_id"]), [float(x) for x in r["cemb"]]) for r in cents_df.collect()
    ]
    cents = spark.createDataFrame(cent_rows, "cell_id int, embedding array<double>").persist()
    cents.count()
    t_train = time.monotonic() - t0
    print(json.dumps({"index": "kmeans_train", "params": {"k": args.clusters // 4, "iters": 2},
                      "wall_sec": round(t_train, 2)}), flush=True)

    configs = [
        ("lsh", {"n_planes": 10, "probe_bits": 0}),
        ("lsh", {"n_planes": 10, "probe_bits": 1}),
        ("lsh", {"n_planes": 14, "probe_bits": 1}),
        ("ivf", {"nprobe": 1}),
        ("ivf", {"nprobe": 2}),
        ("ivf_pruned", {"nprobe": 1}),
        ("ivf_pruned", {"nprobe": 2}),
        ("ivf_pruned", {"nprobe": 4}),
        ("ivf_pruned", {"nprobe": 8}),
        ("ivf_pq", {"nprobe": 4, "m_subspaces": 8, "n_codes": 16}),
        ("ivf_pq", {"nprobe": 8, "m_subspaces": 8, "n_codes": 16}),
        # trained per-subspace codebooks: finer subspaces (bigger M) are
        # the recall knob once code count saturates — the bytes/vector
        # vs recall trade (M bytes at 256 codes)
        ("ivf_pq_trained", {"nprobe": 4, "m_subspaces": 16, "n_codes": 64}),
        ("ivf_pq_trained", {"nprobe": 4, "m_subspaces": 16, "n_codes": 256}),
        ("ivf_pq_trained", {"nprobe": 4, "m_subspaces": 32, "n_codes": 256}),
    ]
    trained_cbs: dict[tuple[int, int], object] = {}
    for index, params in configs:
        t0 = time.monotonic()
        if index == "lsh":
            df = cosine_topk_lsh(
                emb, q, dim=args.dim, k=args.k, planes="rademacher", **params
            )
        elif index == "ivf":
            df = cosine_topk_ivf(
                emb, q, n_cells=args.clusters // 4, k=args.k, centroids=cents, **params
            )
        elif index == "ivf_pruned":
            from lnex_spark.operators.similarity import (
                cosine_topk_ivf_pruned,
                write_ivf_index,
            )

            if not hasattr(main, "_ivf_idx"):
                tt = time.monotonic()
                main._ivf_idx = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
                write_ivf_index(emb, cents, main._ivf_idx)
                print(json.dumps({"index": "ivf_index_build",
                                  "wall_sec": round(time.monotonic() - tt, 2)}),
                      flush=True)
                t0 = time.monotonic()
            df = cosine_topk_ivf_pruned(
                spark, main._ivf_idx, q, cents, k=args.k, **params
            )
        elif index == "ivf_pq_trained":
            from lnex_spark.operators.similarity import train_pq_codebook

            key = (params["m_subspaces"], params["n_codes"])
            if key not in trained_cbs:
                tt = time.monotonic()
                trained_cbs[key] = train_pq_codebook(
                    emb, m_subspaces=key[0], n_codes=key[1], sample_n=10_000, iters=6
                )
                print(json.dumps({"index": "pq_train",
                                  "params": {"m": key[0], "codes": key[1]},
                                  "wall_sec": round(time.monotonic() - tt, 2)}),
                      flush=True)
                t0 = time.monotonic()
            df = ann_ivfpq_topk(
                emb, q, n_cells=args.clusters // 4, k=args.k, centroids=cents,
                codebook=trained_cbs[key], **params
            )
        else:
            df = ann_ivfpq_topk(
                emb, q, n_cells=args.clusters // 4, k=args.k, centroids=cents, **params
            )
        approx, dt, _rows = truth_and_time(df, index, params)
        print(
            json.dumps(
                {"index": index, "params": params, "recall_at_k": recall(approx),
                 "wall_sec": round(dt, 2),
                 "speedup_vs_exact": round(t_exact / dt, 2) if dt else None}
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
