"""Streaming exact-dedup via dropDuplicatesWithinWatermark — the
at-least-once-source idiom: duplicate deliveries of the same
(conv_id, turn_idx) within the watermark window collapse to one row,
with bounded state (unlike plain dropDuplicates on a stream, whose
state grows forever)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
_T0 = datetime(2025, 4, 1, tzinfo=timezone.utc)


def test_stream_dedup_within_watermark(spark, tmp_path):
    rows = []
    for c in range(4):
        for j in range(5):
            r = (f"c{c}", j, "user", f"t {c} {j}", None, _T0 + timedelta(minutes=j))
            rows.append(r)
            if j % 2 == 0:
                rows.append(r)  # duplicate delivery
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    src = str(tmp_path / "src")
    df.write.parquet(src)

    deduped = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 4 * 5  # 26 delivered -> 20 unique
    assert got.groupBy("conv_id", "turn_idx").count().where("count > 1").count() == 0
