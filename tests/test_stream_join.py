"""Stream-stream interval join (streaming/join.py): user→assistant
response pairing, stream ≡ batch, watermark state bounding."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from lnex_spark.streaming.join import response_latency_join

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
_T0 = datetime(2025, 3, 1, tzinfo=timezone.utc)


def _turns(spark):
    rows = []
    for c in range(6):
        for j in range(8):
            rows.append(
                (
                    f"c{c}",
                    j,
                    "user" if j % 2 == 0 else "assistant",
                    f"text {c} {j}",
                    None,
                    _T0 + timedelta(minutes=c * 60 + j * 2),
                )
            )
    # a response that arrives past max_lag: should NOT pair
    rows.append(("late", 0, "user", "q", None, _T0))
    rows.append(("late", 1, "assistant", "a", None, _T0 + timedelta(hours=3)))
    # out-of-order turn_idx but valid times
    rows.append(("ooo", 2, "user", "q", None, _T0))
    rows.append(("ooo", 3, "assistant", "a", None, _T0 + timedelta(seconds=90)))
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_batch_join_pairs_and_latency(spark):
    out = response_latency_join(_turns(spark), max_lag_seconds=3600).collect()
    got = {(r.conv_id, r.user_turn, r.assistant_turn): r.latency_sec for r in out}
    # 4 user turns per conversation c0..c5, each answered 120s later
    assert len(got) == 6 * 4 + 1
    assert got[("c0", 0, 1)] == 120
    assert got[("ooo", 2, 3)] == 90
    assert ("late", 0, 1) not in got  # exceeded max_lag


def test_stream_equals_batch(spark, tmp_path):
    turns = _turns(spark)
    src = str(tmp_path / "src")
    turns.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (
        response_latency_join(stream, watermark="10 minutes", max_lag_seconds=3600)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(str(tmp_path / "out")).collect()))
    want = sorted(
        map(tuple, response_latency_join(turns, max_lag_seconds=3600).collect())
    )
    assert got == want and len(got) > 0


def test_streaming_plan_has_bounded_state(spark, tmp_path):
    """Both join sides carry watermarks — the analyzed plan must show
    them (state eviction; without, the inner join buffers forever)."""
    turns = _turns(spark)
    src = str(tmp_path / "src2")
    turns.write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    joined = response_latency_join(stream, watermark="10 minutes")
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
