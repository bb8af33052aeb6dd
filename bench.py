"""Headline benchmark. Runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "extra": {"turns": N, "turns_per_sec": ..., "cpus": N}}

Queries:
  kg_flagship      full KG pipeline over ~40x-replicated transcripts
                   derived from documents (the extraction-bound path)
  dedup_minhash    MinHash signatures + LSH candidate pairs over docs
  ann_topk         brute-force cosine top-k over embeddings
  text_quality     columnar quality features over replicated turns
  join_agg         3-way join + aggregate over lineitem/orders/customer
  sessionize       gap-based sessions over the skewed transcript stream
  ctx_assembly     previous-3-turn training-pair window over transcripts
  asof_join        backward as-of join (union+window form) over events
  ann_ivf/ann_pq   IVF cell-probe / PQ ADC compressed-scan top-k
  semantic_dedup   kmeans quantize + SemDeDup cluster-then-prune over embeddings
  media_decode     encode+decode Arrow stage over real BMP/PPM/WAV payloads
  curation_e2e     dedup -> gate -> scrub -> context -> packing over transcripts
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

REPLICAS = int(os.environ.get("BENCH_REPLICAS", "40"))

# min-of-N per query (N=3 default): rep 1 pays one-time costs a
# long-lived cluster amortizes (codegen JIT, broadcast ship, page-cache
# fill); later reps measure the engine. Three reps because this host's
# external noise is bursty and one-sided (measured 3x swings with zero
# local CPU consumers) — the min of three captures the floor the
# engine actually has. Caches are reset between reps for the queries
# where Spark's cache manager would otherwise serve the identical plan
# from cache.
DEFAULT_REPEAT = "3"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from lnex_spark.data import fixtures as FX
    from lnex_spark.data.derive import transcripts_from_documents
    from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
    from lnex_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from lnex_spark.operators.similarity import cosine_topk_bruteforce
    from lnex_spark.operators.textquality import quality_features
    from lnex_spark.pipeline import build_gazetteer, extract_link
    from lnex_spark.operators.triples import mention_triples
    from lnex_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="lnex_bench", shuffle_partitions=cpus)

    # the local testdata tables are single parquet files → one input
    # split; spread them to the session's parallelism after read so the
    # bench reflects a real cluster's multi-file scan planning (on a
    # cluster Iceberg file planning provides these splits for free)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(cpus)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    # BENCH_DENSE_TURNS=1 derives a DENSE per-conversation turn_idx —
    # the layout curate_transcripts' chunked-halo window contracts for
    # (the default gapped layout is kept for headline continuity with
    # r1-r4 and is fine as pure volume for the other queries; the
    # dense derivation pays a one-time hot-partition window OUTSIDE
    # the timed region).  The curation timing is recorded under
    # curation_e2e_dense so scaling bests never mix layouts.
    dense = os.environ.get("BENCH_DENSE_TURNS") == "1"
    transcripts = transcripts_from_documents(
        docs, "chennai", replicas=REPLICAS, dense_turn_idx=dense
    ).repartition(cpus * 2)
    # materialize the derived input once so the flagship timing measures
    # the ENGINE, not the synthetic-data generator
    transcripts = transcripts.persist()
    n_turns = transcripts.count()

    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}

    # gazetteer build + Python-worker warm-up serve only kg_flagship;
    # skip them when BENCH_ONLY times other queries (e.g. the curation
    # scaling runs) — minutes of per-JVM setup outside the timed region
    model = None
    if not only or "kg_flagship" in only:
        gaz = spark.createDataFrame(FX.gen_gazetteer("chennai"), GAZETTEER_SCHEMA)
        stop = spark.createDataFrame([(w,) for w in FX.gen_stopwords()], "word string")
        wl = spark.createDataFrame(FX.gen_wordlist(), "word string, freq long")
        model = build_gazetteer(spark, gaz, stop, wl)
        model.variants.count()  # force the (cached) gazetteer build

        # warm the Python worker pool (fork + pandas/numpy import is a
        # one-time per-executor cost that a long-lived cluster
        # amortizes; timing it against a seconds-scale local job would
        # measure worker bootstrap, not the engine)
        from lnex_spark.operators.extract import extract_mentions_df

        extract_mentions_df(
            transcripts.limit(cpus * 200).repartition(cpus), model.bc_struct
        ).count()

    timings: dict[str, float] = {}
    repeat = int(os.environ.get("BENCH_REPEAT", DEFAULT_REPEAT))

    def run(name: str, fn, reset=None) -> None:
        if only and name not in only:
            return
        best = None
        for i in range(repeat):
            if i > 0 and reset is not None:
                reset()  # outside the timed region
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    def reset_caches() -> None:
        # drop the previous rep's persisted winners (Spark's cache
        # manager would otherwise serve the identical plan from cache,
        # turning reps 2..n into cache reads), then re-pin the inputs
        spark.catalog.clearCache()
        transcripts.persist().count()
        if model is not None:
            model.variants.persist().count()

    run(
        "kg_flagship",
        lambda: mention_triples(extract_link(transcripts, model, salt_partitions=cpus)).count(),
        reset=reset_caches,
    )
    run(
        "dedup_minhash",
        lambda: lsh_candidate_pairs(minhash_signatures(docs, k=8, n=3), bands=4).count(),
    )
    q = emb.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("query_id"), "embedding")
    run("ann_topk", lambda: cosine_topk_bruteforce(emb, q, k=10).count())
    turns_as_docs = transcripts.select(F.col("turn_idx").cast("long").alias("doc_id"), "text")
    run(
        "text_quality",
        lambda: quality_features(turns_as_docs).agg(F.avg("quality_score")).collect(),
    )
    run(
        "join_agg",
        lambda: (
            customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .join(orders, orders.o_custkey == customer.c_custkey)
            .join(li, li.l_orderkey == orders.o_orderkey)
            .groupBy("n_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .count()
        ),
    )

    from lnex_spark.operators.asof import asof_join_backward
    from lnex_spark.operators.sessions import session_stats, sessionize
    from lnex_spark.operators.similarity import cosine_topk_ivf

    # sessionize the replicated transcripts (the skewed stream itself)
    run(
        "sessionize",
        lambda: session_stats(
            sessionize(transcripts, key="conv_id", order_tiebreak="turn_idx", gap_seconds=600),
            key="conv_id",
        ).count(),
    )
    # training-pair context assembly (r2): previous-3-turn window over the
    # same skewed transcripts — one conv_id shuffle serves every pair; the
    # agg keeps the timed region output-bound on compute, not toPandas
    from pyspark.sql import Window as W

    ctx_w = W.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(-3, -1)
    run(
        "ctx_assembly",
        lambda: (
            transcripts.withColumn(
                "context", F.concat_ws(" <SEP> ", F.collect_list("text").over(ctx_w))
            )
            .where(F.col("role") == "assistant")
            .agg(F.sum(F.length("context")).alias("n"))
            .collect()
        ),
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    ).groupBy("user_id", "ts").agg(F.max("err_id").alias("err_id"))
    run("asof_join", lambda: asof_join_backward(clicks, errors, on=["user_id"]).count())
    run("ann_ivf", lambda: cosine_topk_ivf(emb, q, n_cells=16, nprobe=2, k=10).count())

    from lnex_spark.operators.similarity import pq_adc_topk

    # PQ ADC compressed scan (r2): one Arrow pass over the corpus,
    # distance tables broadcast in the closure, per-batch top-k
    run("ann_pq", lambda: pq_adc_topk(emb, q, m_subspaces=8, n_codes=16, k=10).count())

    # SemDeDup over kmeans centroids (r3): the REAL semantic-dedup path —
    # Lloyd quantizer (not the first-n-by-id test centroids) feeding the
    # cluster-then-prune dedup; timed region covers quantize + assign +
    # intra-cell prune, i.e. the whole pipeline a curation job runs.
    # Throughput path is semantic_dedup_arrow (BLAS matmuls per Arrow
    # batch/cell; measured 3.6-5.9x over the relational form, which
    # pays per-element lambda interpretation in aggregate(zip_with) —
    # the relational twin stays the driver-checked oracle and a pytest
    # asserts identical keep/drop).
    from lnex_spark.operators.clustering import kmeans_lloyd_arrow
    from lnex_spark.operators.similarity import semantic_dedup_arrow

    def _semantic_dedup_kmeans() -> int:
        cents, _ = kmeans_lloyd_arrow(emb, k=16, iters=2)
        # centroids are k tiny rows whose LINEAGE is the whole iterative
        # quantizer: collect to literals (bounded: k x dim doubles) so
        # the quantizer runs exactly once — the train-small/apply-big
        # shape a 100 TB job uses
        rows = [(int(r["cell_id"]), [float(x) for x in r["cemb"]]) for r in cents.collect()]
        cent = spark.createDataFrame(rows, "cell_id int, embedding array<double>")
        return (
            semantic_dedup_arrow(emb, tau=0.95, centroids=cent)
            .filter(F.col("keep"))
            .count()
        )

    run("semantic_dedup", _semantic_dedup_kmeans)

    # real media decode (r2): synthesize encoded BMP/PPM/WAV/VID0 payloads
    # and run the full decode+stats Arrow stage; timing covers encode+decode
    # so it lower-bounds pure decode throughput
    from lnex_spark.operators.multimodal import (
        audio_stats_op,
        image_stats,
        synthesize_real_media,
    )

    media = synthesize_real_media(docs)
    run(
        "media_decode",
        lambda: image_stats(media).unionByName(
            audio_stats_op(media), allowMissingColumns=True
        ).count(),
    )

    # transcript-curation flagship (r2): conversation-level exact dedup ->
    # quality gate -> PII scrub -> previous-3-turn context assembly ->
    # sharded sequence packing, all relational (zero Python rows).
    # Permissive gate params so every stage carries the full corpus.
    # NOTE: the replicated conversations are NOT fingerprint duplicates
    # (each replica re-ids doc_id, so turn_idx and the planted text
    # differ) — the dedup stage hashes every turn but eliminates
    # nothing, and every downstream stage carries the full volume: the
    # honest worst case for the timing.
    from lnex_spark.operators.curation import curate_transcripts

    # shards must be O(cluster parallelism): the packing cumsum window
    # has exactly `shards` distinct keys, so shards=8 caps that stage
    # at 8 tasks (measured: 4->16-core scaling eff 0.44). 256 is
    # cluster-shaped and FIXED so every parallelism level computes the
    # identical packing (fair scaling comparison; at 100 TB you'd use
    # ~4x total cores).
    run(
        "curation_e2e_dense" if dense else "curation_e2e",
        lambda: curate_transcripts(
            transcripts.select("conv_id", "turn_idx", "role", "text"),
            shards=256,
            min_turns=2,
            len_band=(1.0, 100000.0),
        ).count(),
    )

    total = round(sum(timings.values()), 3)
    spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "turns": n_turns,
                    "turns_per_sec": (
                        round(n_turns / timings["kg_flagship"], 1)
                        if "kg_flagship" in timings
                        else None
                    ),
                    "cpus": cpus,
                    "replicas": REPLICAS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
