"""Python Data Source writer: batch and streaming JSONL sink with a
files-then-manifest commit protocol (see lnex_spark/sources/pysink.py).
"""

from __future__ import annotations

import json
import os

from lnex_spark.sources import pysink

SCHEMA = "event_id long, event_type string, user_id long"


def _rows(n):
    return [(i, f"type_{i % 3}", i % 7) for i in range(n)]


def test_batch_write_roundtrip(spark, tmp_path):
    pysink.register(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(_rows(100), SCHEMA).repartition(4)
    df.write.format("jsonl_sink").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 100
    # every manifested file exists; no stray part files outside it
    parts = {f for f in os.listdir(out) if f.startswith("part-")}
    assert set(manifest["files"]) == parts

    got = sorted(
        (r["event_id"], r["event_type"], r["user_id"])
        for r in pysink.read_manifested(out)
    )
    assert got == sorted(_rows(100))


def test_batch_overwrite_replaces(spark, tmp_path):
    pysink.register(spark)
    out = str(tmp_path / "out")
    spark.createDataFrame(_rows(50), SCHEMA).write.format("jsonl_sink").mode(
        "append"
    ).save(out)
    spark.createDataFrame(_rows(20), SCHEMA).write.format("jsonl_sink").mode(
        "overwrite"
    ).save(out)
    assert len(pysink.read_manifested(out)) == 20


def test_stream_write_matches_batch(spark, tmp_path):
    pysink.register(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(_rows(80), SCHEMA).repartition(3).write.parquet(src)

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    epochs = [f for f in os.listdir(out) if f.startswith("_MANIFEST-")]
    assert epochs, "streaming write must commit at least one epoch manifest"
    got = sorted(
        (r["event_id"], r["event_type"], r["user_id"])
        for r in pysink.read_manifested(out)
    )
    assert got == sorted(_rows(80))
