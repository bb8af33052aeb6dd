"""Python Data Source (sources/synth.py): batch read, partition
planning, filter pushdown pruning, determinism, and the streaming
reader's offset protocol + stream ≡ batch."""

from __future__ import annotations

import time

from lnex_spark.sources.synth import (
    SynthTranscriptReader,
    SynthTranscriptStreamReader,
    register,
)


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("transcripts_synth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_shape_and_determinism(spark):
    df = _read(spark, n_convs=12, turns_per_conv=6, num_partitions=3)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == 72
    r0 = df.orderBy("conv_id", "turn_idx").first()
    assert (r0.conv_id, r0.turn_idx, r0.role) == ("c0", 0, "user")
    assert r0.text == "turn 0 0 a2ddbe7a"  # md5('c0:0')[:8], engine-independent
    # identical rows regardless of partitioning
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, n_convs=12, turns_per_conv=6, num_partitions=7).collect()))
    assert a == b


def test_ts_monotone_within_conv(spark):
    df = _read(spark, n_convs=3, turns_per_conv=5, num_partitions=2)
    rows = df.orderBy("conv_id", "turn_idx").collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r.ts)
    for ts_list in by_conv.values():
        assert ts_list == sorted(ts_list) and len(set(ts_list)) == len(ts_list)


def test_filter_results_correct(spark):
    df = _read(spark, n_convs=12, turns_per_conv=6, num_partitions=3)
    assert df.filter("conv_id = 'c3'").count() == 6
    assert df.filter("turn_idx < 2").count() == 24
    assert df.filter("conv_id in ('c1','c2','c999')").count() == 12
    got = {r.conv_id for r in df.filter("conv_id = 'c3'").collect()}
    assert got == {"c3"}


def test_pushdown_prunes_generation():
    from pyspark.sql.datasource import EqualTo, In, LessThan

    r = SynthTranscriptReader({"n_convs": "100", "turns_per_conv": "20", "num_partitions": "8"})
    leftover = list(r.pushFilters([EqualTo(("conv_id",), "c7"), LessThan(("turn_idx",), 5)]))
    assert len(leftover) == 2  # Spark still re-checks everything
    parts = r.partitions()
    assert [(p.lo, p.hi) for p in parts] == [(7, 8)]
    rows = list(r.read(parts[0]))
    assert len(rows) == 5 and all(t[0] == "c7" for t in rows)

    r2 = SynthTranscriptReader({"n_convs": "100", "num_partitions": "8"})
    list(r2.pushFilters([In(("conv_id",), ["c1", "c3", "c999"])]))
    assert [(p.lo, p.hi) for p in r2.partitions()] == [(1, 2), (3, 4)]

    # no filters: conv space split into num_partitions ranges
    r3 = SynthTranscriptReader({"n_convs": "100", "num_partitions": "8"})
    parts = r3.partitions()
    assert len(parts) == 8 and parts[0].lo == 0 and parts[-1].hi == 100


def test_stream_reader_offset_protocol():
    sr = SynthTranscriptStreamReader(
        {"n_convs": "12", "turns_per_conv": "6", "convs_per_batch": "5"}
    )
    off = sr.initialOffset()
    seen = []
    for expected_hi in (5, 10, 12, 12):
        rows, off = sr.read(off)
        seen.extend(rows)
        assert off == {"next_conv": expected_hi}
    assert len(seen) == 72
    # replay between offsets is exact
    replay = sr.readBetweenOffsets({"next_conv": 5}, {"next_conv": 10})
    assert replay == [t for t in seen if 5 <= int(t[0][1:]) < 10]


def test_stream_equals_batch(spark, tmp_path):
    register(spark)
    q = (
        spark.readStream.format("transcripts_synth")
        .option("n_convs", 9)
        .option("turns_per_conv", 4)
        .option("convs_per_batch", 4)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("synth_stream_mem").count() >= 36:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("synth_stream_mem").collect()))
    want = sorted(
        map(tuple, _read(spark, n_convs=9, turns_per_conv=4, num_partitions=2).collect())
    )
    assert got == want
