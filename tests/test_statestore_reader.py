"""State-store introspection: the `statestore` / `state-metadata`
readers turn a streaming checkpoint into queryable DataFrames — the
ops story for debugging a stuck 100 TB streaming job (inspect what
the state actually holds without replaying the stream).

The state a running aggregation holds must equal the batch aggregate
of everything fed so far; the metadata source must describe the
operator that owns it.
"""

from __future__ import annotations

import pyspark.sql.functions as F

EVENTS_SCHEMA = "user_id long, event_type string"


def _run_counts_stream(spark, src: str, ckpt: str, name: str) -> None:
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        stream.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_statestore_reader_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i % 7, f"type_{i % 3}") for i in range(500)]
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(4).write.parquet(src)
    _run_counts_stream(spark, src, ckpt, "ss_counts1")

    state = spark.read.format("statestore").load(ckpt)
    # key mirrors the grouping key; value is the agg buffer (field "count")
    got = {
        r["key"]["event_type"]: r["value"]["count"] for r in state.collect()
    }
    expect = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(src).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect

    # a second batch of data must be reflected in the updated state
    more = [(99, "type_0") for _ in range(25)]
    spark.createDataFrame(more, EVENTS_SCHEMA).write.mode("append").parquet(src)
    _run_counts_stream(spark, src, ckpt, "ss_counts2")
    got2 = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in spark.read.format("statestore").load(ckpt).collect()
    }
    assert got2["type_0"] == expect["type_0"] + 25


def test_state_metadata_source(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a")], EVENTS_SCHEMA).write.parquet(src)
    _run_counts_stream(spark, src, ckpt, "ss_meta")

    meta = spark.read.format("state-metadata").load(ckpt)
    ops = [r["operatorName"] for r in meta.collect()]
    assert "stateStoreSave" in ops
