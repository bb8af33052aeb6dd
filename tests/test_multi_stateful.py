"""Chained stateful operators in ONE streaming query (Spark ≥ 3.5
lifts the single-stateful-operator restriction): a windowed
per-user aggregation feeding a second windowed aggregation, both
watermarked, in append mode. The end-to-end result must equal the
batch twin over the same input — pinning that multi-stateful
pipelines (the shape of any metrics-of-metrics rollup on a 100 TB
stream) work and stay correct.
"""

from __future__ import annotations

import pyspark.sql.functions as F

EVENTS_SCHEMA = "user_id long, ts timestamp, value double"


def _chain(df):
    """hour window x user count  →  per-hour distinct-user count."""
    per_user = (
        df.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return per_user.groupBy("w").agg(
        F.count("*").alias("n_users"),
        F.sum("n_events").alias("n_events"),
    )


def test_chained_windowed_aggs_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (i % 9, f"2024-03-01 {h:02d}:{i % 60:02d}:00", float(i))
        for h in range(6)
        for i in range(40)
    ]
    (
        spark.createDataFrame(rows, "user_id long, ts string, value double")
        .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
        .repartition(4)
        .write.parquet(src)
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = str(tmp_path / "out")
    q = (
        _chain(stream)
        .select(F.col("w.start").alias("ws"), "n_users", "n_events")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        tuple(r)
        for r in _chain(spark.read.parquet(src))
        .select(F.col("w.start").alias("ws"), "n_users", "n_events")
        .collect()
    )
    # append mode emits a window only once the watermark passes its
    # end; the final hour's window stays open (watermark == max event
    # time < window end), so the stream legitimately emits all but it
    assert got == batch[:-1] and len(got) == 5
