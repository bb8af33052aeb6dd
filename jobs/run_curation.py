"""spark-submit entrypoint for the transcript-curation pipeline
(``spark-submit --py-files lnex_spark.zip jobs/run_curation.py ...``).

The batch twin of jobs/run_kg.py for the training-data side of the
engine: conversation-level exact dedup → quality gate → PII scrub →
previous-3-turn context assembly → sharded sequence packing
(operators/curation.curate_transcripts — zero text bytes in any
shuffle), plus optional emission of the materialized training pairs.

Incremental mode: with --state, conversation fingerprints of
everything already processed persist as a parquet table; a rerun
dedups the NEW batch against that state and appends only novel
conversations' fingerprints — batch-proportional work against
accumulated state (operators/curation.classify_new_conversations).

Example (cluster):
    spark-submit --py-files lnex_spark.zip jobs/run_curation.py \
        --transcripts catalog.db.transcripts \
        --out /warehouse/curated --shards 4096 \
        --state /warehouse/curated_fp_state --emit-pairs

Example (local smoke):
    python jobs/run_curation.py \
        --transcripts /root/testdata/sf0.001/documents.parquet \
        --derive-from-documents --out /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.errors import AnalysisException

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Transcript curation over conversation tables")
    p.add_argument("--transcripts", required=True, help="table name or parquet path")
    p.add_argument(
        "--derive-from-documents",
        action="store_true",
        help="input is a documents table; derive (conv_id, turn_idx, role, text) from it",
    )
    p.add_argument("--region", default="chennai", help="fixture region for --derive-from-documents")
    p.add_argument("--out", required=True, help="output path prefix")
    p.add_argument("--budget", type=int, default=120, help="token budget per packed sequence")
    p.add_argument(
        "--shards",
        type=int,
        default=256,
        help="packing-shard count — size O(cluster cores); pins seq_id assignment",
    )
    p.add_argument("--min-turns", type=int, default=2)
    p.add_argument("--len-band", default="1.0,100000.0", help="min,max mean turn length gate")
    p.add_argument(
        "--state",
        default=None,
        help="fingerprint-state parquet path: dedup this batch against prior runs, append novel",
    )
    p.add_argument(
        "--emit-pairs",
        action="store_true",
        help="also write the materialized (context, target) training pairs",
    )
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from lnex_spark.operators.curation import (
        classify_new_conversations,
        conversation_fingerprints,
        curate_transcripts,
        emit_training_pairs,
    )
    from lnex_spark.session import get_spark
    from lnex_spark.sources.tableformat import read_table

    spark = get_spark(master=None, app_name="lnex_curation")

    t = read_table(spark, args.transcripts)
    if args.derive_from_documents:
        from lnex_spark.data.derive import transcripts_from_documents

        t = transcripts_from_documents(t, args.region)
    t = t.select("conv_id", "turn_idx", "role", "text")

    metrics: dict[str, int] = {}
    novel = None
    if args.state:
        # incremental: drop conversations whose fingerprint is already
        # in state (earlier runs OR an earlier twin in this batch), then
        # append only the novel fingerprints — the state table stays one
        # row per distinct conversation ever seen
        from lnex_spark.operators.lineage import path_exists

        exists = path_exists(spark, args.state)
        if exists is None:
            # probe unavailable (non-JVM session, e.g. Connect): decide
            # by attempting the read — an existing state table must NOT
            # be silently treated as absent (that would re-emit every
            # already-processed conversation and duplicate state rows)
            try:
                state = spark.read.parquet(args.state)
                state.schema  # force analysis so a missing path raises here
            except AnalysisException as ex:
                # ONLY a definitive path-not-found may mean "first run".
                # Any other failure (transient IO, permissions, schema)
                # on an EXISTING state table must abort: classifying it
                # as absent would re-emit every already-processed
                # conversation and append duplicate fingerprints.
                if "PATH_NOT_FOUND" in str(ex) or "Path does not exist" in str(ex):
                    exists = False
                else:
                    raise
            else:
                exists = True
        if exists:
            state = spark.read.parquet(args.state)
        else:
            # first run: empty state with the fingerprint-table shape
            state = spark.createDataFrame([], "conv_id string, fingerprint string")
        cls = classify_new_conversations(state, t)
        novel = cls.where(F.col("status") == "novel").select("conv_id").persist()
        metrics["batch_conversations"] = cls.count()
        metrics["novel_conversations"] = novel.count()  # also pins `novel`
        t = t.join(F.broadcast(novel), "conv_id")

    lo, hi = (float(x) for x in args.len_band.split(","))
    packed = curate_transcripts(
        t, budget=args.budget, shards=args.shards, min_turns=args.min_turns, len_band=(lo, hi)
    )
    packed.write.mode("overwrite").parquet(f"{args.out}/packed")
    metrics["packed_sequences"] = spark.read.parquet(f"{args.out}/packed").count()

    if args.emit_pairs:
        pairs = emit_training_pairs(t, min_turns=args.min_turns, len_band=(lo, hi))
        pairs.write.mode("overwrite").parquet(f"{args.out}/pairs")
        metrics["training_pairs"] = spark.read.parquet(f"{args.out}/pairs").count()

    if args.state:
        # append the batch's novel fingerprints LAST: a crash before
        # this point leaves state untouched, so a rerun re-processes
        # the batch instead of silently classifying it dup_of_state
        # and dropping it forever.  `novel` is persisted above, so this
        # does not lazily re-read the state path mid-append.
        new_fp = conversation_fingerprints(t)
        new_fp.write.mode("append").parquet(args.state)
        novel.unpersist()

    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
