"""transformWithStateInPandas first-mention operator (streaming/
stateful2.py): stream ≡ batch ≡ v1, on the RocksDB state store."""

from __future__ import annotations

import pytest

from lnex_spark.streaming.stateful2 import state_v2_available

pytestmark = pytest.mark.skipif(
    not state_v2_available(),
    reason="transformWithStateInPandas needs the protobuf runtime "
    "(absent in this sandbox); v1 applyInPandasWithState is the "
    "tested path here",
)

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, surface string, norm string"
)

ROWS = [
    ("c1", 0, 0, 5, "paris", "paris"),
    ("c1", 0, 10, 15, "tokyo", "tokyo"),
    ("c1", 1, 0, 5, "paris", "paris"),  # repeat -> False
    ("c1", 2, 3, 8, "tokyo", "tokyo"),  # repeat -> False
    ("c2", 0, 0, 5, "paris", "paris"),  # new conversation -> True again
    ("c2", 5, 0, 4, "oslo", "oslo"),
]


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield spark
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_v2_stream_matches_batch_and_v1(rocksdb_state, tmp_path):
    spark = rocksdb_state
    from lnex_spark.streaming.stateful import first_mention_flags
    from lnex_spark.streaming.stateful2 import stream_first_mentions_v2

    mentions = spark.createDataFrame(ROWS, MENTIONS_SCHEMA)
    src = str(tmp_path / "src")
    mentions.write.parquet(src)

    q = (
        stream_first_mentions_v2(spark.readStream.schema(MENTIONS_SCHEMA).parquet(src))
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
        map(
            tuple,
            first_mention_flags(mentions)
            .select("conv_id", "turn_idx", "start", "norm", "is_first")
            .collect(),
        )
    )
    assert got == want
    assert sum(1 for r in got if r[4]) == 4  # paris/tokyo in c1, paris/oslo in c2


def test_v2_state_carries_across_microbatches(rocksdb_state, tmp_path):
    """Second micro-batch must see the first batch's state: a norm
    first seen in batch 1 is not 'first' again in batch 2."""
    spark = rocksdb_state
    from lnex_spark.streaming.stateful2 import stream_first_mentions_v2

    src = tmp_path / "src2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")

    def run_batch(rows, subdir):
        spark.createDataFrame(rows, MENTIONS_SCHEMA).coalesce(1).write.parquet(
            str(src / subdir)
        )
        q = (
            stream_first_mentions_v2(
                spark.readStream.schema(MENTIONS_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src) + "/*")
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([("c1", 0, 0, 5, "paris", "paris")], "b1")
    run_batch([("c1", 9, 0, 5, "paris", "paris"), ("c1", 9, 9, 13, "oslo", "oslo")], "b2")

    got = {(r.turn_idx, r.norm): r.is_first for r in spark.read.parquet(out).collect()}
    assert got == {(0, "paris"): True, (9, "paris"): False, (9, "oslo"): True}
