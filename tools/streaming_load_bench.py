"""Sustained-load benchmark for the streaming paths (VERDICT r04 item
6): the stream operators are correctness-tested (stream ≡ batch) but
had never been driven under sustained input.  This tool runs the
built-in ``rate`` source at a configured rows/sec for a configured
duration through the two stateful shapes the engine ships:

  windowed_rates      watermark + 10s tumbling window count per norm
                      (the stream_mention_rates aggregation shape,
                      minus the Arrow extraction stage — extraction
                      throughput is the flagship batch bench's number)
  first_mention       applyInPandasWithState per-conversation
                      first-mention dedup (streaming/stateful.py),
                      the custom-state hot path
  dedup_watermark     dropDuplicatesWithinWatermark on (conv_id, norm)
                      — the built-in dedup state operator

Per query it harvests StreamingQuery.recentProgress every second
(lastProgress polling misses sub-interval batches and undercounts
input rows) and reports one JSON line:

  {"query": ..., "target_rows_per_sec": R, "duration_sec": D,
   "batches": n, "input_rows": N, "achieved_rows_per_sec": ...,
   "avg_process_rows_per_sec": ..., "p95_batch_ms": ...,
   "batch_ms_trend": ..., "sustained": ...,
   "state_rows": ..., "state_mb": ..., "watermark_lag_sec_end": ...}

``sustained`` (see the comment in ``drive``): achieved ≥ 0.9×target
AND end watermark lag ≈ the 30s delay AND batch durations not
trending up — per-batch inputRowsPerSecond is NOT usable because the
rate source backfills a startup backlog.  Usage:

    python tools/streaming_load_bench.py [rows_per_sec ...] \
        [--duration 45] [--cpus 8] [--query all|windowed_rates|...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CONVS = 10_000
VOCAB = 500


def synth_stream(spark, rows_per_sec: int, cpus: int):
    """rate source → the (conv_id, turn_idx, start, norm, ts) mention
    shape: conv skew-free round-robin, vocabulary of VOCAB norms.
    Generation is pure column arithmetic (zero Python), so the bench
    measures the STATE operator, not the generator."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", cpus)
        .load()
        .select(
            F.concat(F.lit("c"), (F.col("value") % N_CONVS)).alias("conv_id"),
            (F.col("value") / N_CONVS).cast("int").alias("turn_idx"),
            F.lit(0).alias("start"),
            F.concat(F.lit("loc_"), (F.col("value") % VOCAB)).alias("norm"),
            F.col("timestamp").alias("ts"),
        )
    )


def build_query(name: str, src, ckpt: str):
    from pyspark.sql import functions as F

    if name == "windowed_rates":
        out = (
            src.withWatermark("ts", "30 seconds")
            .groupBy(F.window("ts", "10 seconds").alias("win"), "norm")
            .agg(F.count("*").alias("n"))
        )
        mode = "update"
    elif name == "first_mention":
        from lnex_spark.streaming.stateful import stream_first_mentions

        out = stream_first_mentions(src)
        mode = "append"
    elif name == "dedup_watermark":
        out = src.withWatermark("ts", "30 seconds").dropDuplicatesWithinWatermark(
            ["conv_id", "norm"]
        )
        mode = "append"
    else:
        raise ValueError(name)
    return (
        out.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )


def drive(spark, name: str, rate: int, duration: int, cpus: int) -> dict:
    src = synth_stream(spark, rate, cpus)
    # ignore_cleanup_errors: query.stop() returns before the checkpoint
    # writer fully quiesces, so rmtree can race a late offset/state file
    with tempfile.TemporaryDirectory(
        prefix=f"slb_{name}_", ignore_cleanup_errors=True
    ) as ckpt:
        q = build_query(name, src, ckpt)
        t0 = time.monotonic()
        progresses: dict[int, dict] = {}

        def harvest() -> None:
            # recentProgress, not lastProgress: batches can complete in
            # well under the poll interval, and a lastProgress poll
            # silently skips them — undercounting input_rows and
            # misreading a keeping-up query as "behind the rate"
            for p in q.recentProgress:
                if p and p.get("numInputRows") is not None:
                    progresses[p["batchId"]] = p

        try:
            while time.monotonic() - t0 < duration:
                time.sleep(1.0)
                harvest()
        finally:
            harvest()
            q.stop()
            try:
                q.awaitTermination(30)
            except Exception:
                pass

    # drop the warm-up batch (triggers JIT + python worker fork for the
    # stateful op) — sustained load is the steady-state number
    batches = [progresses[b] for b in sorted(progresses)][1:]
    batches = [b for b in batches if b.get("numInputRows", 0) > 0]
    if not batches:
        return {"query": name, "target_rows_per_sec": rate, "error": "no batches"}

    pr_rates = [
        b["processedRowsPerSecond"] for b in batches if "processedRowsPerSecond" in b
    ]
    durs = [b["durationMs"]["triggerExecution"] for b in batches]
    last = batches[-1]
    state = (last.get("stateOperators") or [{}])[0]
    wm_lag = None
    wm = (last.get("eventTime") or {}).get("watermark")
    if wm:
        wm_ts = datetime.fromisoformat(wm.replace("Z", "+00:00"))
        bt = datetime.fromisoformat(last["timestamp"].replace("Z", "+00:00"))
        # the watermark starts at epoch 0 until the first commit — a
        # 1970 watermark is "not yet established", not a 56-year lag
        if wm_ts.year > 2000:
            wm_lag = round((bt - wm_ts).total_seconds(), 1)

    # Sustained-load verdict.  Per-batch inputRowsPerSecond is NOT
    # usable: the rate source backfills a startup backlog, so early
    # batches report inflated instantaneous rates.  A query keeps up
    # with a rate-limited source iff
    #   (a) achieved throughput over the run ≈ the configured rate
    #       (a falling-behind query consumes the same rows — it is the
    #        lag that grows, not the deficit — so (a) alone is weak),
    #   (b) end-of-run watermark lag ≈ the 30s watermark delay
    #       (unbounded lag growth = backlog), and
    #   (c) batch durations are not trending up (tail avg vs head avg
    #       after the dropped warm-up batch).
    input_rows = int(sum(b["numInputRows"] for b in batches))
    t_first = datetime.fromisoformat(batches[0]["timestamp"].replace("Z", "+00:00"))
    t_last = datetime.fromisoformat(last["timestamp"].replace("Z", "+00:00"))
    span = (t_last - t_first).total_seconds() + durs[-1] / 1000.0
    achieved = input_rows / span if span > 0 else 0.0
    lag_slack = None if wm_lag is None else wm_lag - 30.0
    k = max(1, min(3, len(durs) // 3))
    trend = statistics.mean(durs[-k:]) / max(statistics.mean(durs[:k]), 1.0)
    sustained = (
        achieved >= 0.9 * rate
        and (lag_slack is None or lag_slack <= 10.0)
        and trend <= 2.0
    )
    return {
        "query": name,
        "target_rows_per_sec": rate,
        "duration_sec": duration,
        "batches": len(batches),
        "input_rows": input_rows,
        "achieved_rows_per_sec": round(achieved, 1),
        "avg_process_rows_per_sec": (
            round(statistics.mean(pr_rates), 1) if pr_rates else None
        ),
        "p95_batch_ms": int(sorted(durs)[max(0, int(len(durs) * 0.95) - 1)]),
        "batch_ms_trend": round(trend, 2),
        "sustained": bool(sustained),
        "state_rows": state.get("numRowsTotal"),
        "state_mb": (
            round(state.get("memoryUsedBytes", 0) / 1e6, 2)
            if state.get("memoryUsedBytes") is not None
            else None
        ),
        "watermark_lag_sec_end": wm_lag,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("rates", nargs="*", type=int, default=None)
    ap.add_argument("--duration", type=int, default=45)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--query", default="all")
    args = ap.parse_args()
    rates = args.rates or [50_000, 200_000]
    names = (
        ["windowed_rates", "first_mention", "dedup_watermark"]
        if args.query == "all"
        else [args.query]
    )

    from lnex_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="streaming_load_bench",
        shuffle_partitions=args.cpus,
    )
    spark.conf.set("spark.sql.streaming.metricsEnabled", "true")
    results = []
    for name in names:
        for rate in rates:
            r = drive(spark, name, rate, args.duration, args.cpus)
            print(json.dumps(r), flush=True)
            results.append(r)
    ok = all(r.get("sustained") for r in results if "error" not in r)
    print(json.dumps({"all_sustained": ok, "utc": datetime.now(timezone.utc).isoformat()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
