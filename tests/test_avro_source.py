"""Pure-Python Avro OCF source/sink (lnex_spark/sources/avro_py.py):
spec byte-vectors, typed round-trips through Spark, the
files-then-manifest commit protocol, multi-block files, codecs.
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime

import pytest

from lnex_spark.sources import avro_py as A

SCHEMA_DDL = (
    "b boolean, i int, l long, f float, d double, s string, bin binary, "
    "ts timestamp, dt date, arr array<float>"
)


def _typed_rows():
    return [
        (
            True,
            -(2**31),
            -(2**63),
            1.5,
            -2.25e100,
            "héllo ☃ world",
            bytearray(b"\x00\xffraw"),
            datetime(2025, 6, 1, 12, 34, 56, 789012),
            date(1969, 7, 20),
            [1.0, None, -0.5],
        ),
        (False, 2**31 - 1, 2**63 - 1, -0.0, float("inf"), "", b"", datetime(1970, 1, 1), date(1970, 1, 1), []),
        (None, None, None, None, None, None, None, None, None, None),
    ]


# ---------------------------------------------------------------------------
# Binary-encoding spec vectors (Avro 1.11 "Binary encoding": zigzag varints)
# ---------------------------------------------------------------------------


def test_zigzag_spec_vectors():
    # the exact table from the Avro specification
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"), (63, b"\x7e"), (64, b"\x80\x01")]:
        assert A._enc_long(n) == b, n
        v, pos = A._dec_long(memoryview(b), 0)
        assert (v, pos) == (n, len(b))


def test_long_extremes_roundtrip():
    for n in [-(2**63), 2**63 - 1, -(2**31), 2**31 - 1, 10**17, -(10**17)]:
        v, _ = A._dec_long(memoryview(A._enc_long(n)), 0)
        assert v == n


def test_ocf_magic_and_header():
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    path = "/tmp/_avro_hdr_test.avro"
    A.write_rows_local(path, schema, [(7,), (-7,)], codec="deflate")
    with open(path, "rb") as f:
        raw = f.read()
    assert raw[:4] == b"Obj\x01"  # spec magic
    with open(path, "rb") as f:
        got_schema, codec, sync, pos = A.read_ocf_header(f)
    assert got_schema == schema and codec == "deflate" and len(sync) == 16
    assert list(A.iter_ocf_rows(path)) == [(7,), (-7,)]


def test_multi_block_and_sync_markers():
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    path = "/tmp/_avro_blocks_test.avro"
    rows = [(i,) for i in range(100)]
    with open(path, "wb") as f:
        A.write_ocf(f, schema, iter(rows), codec="null", block_rows=7)
    with open(path, "rb") as f:
        _, _, sync, _ = A.read_ocf_header(f)
    data = open(path, "rb").read()
    # 100 rows / 7 per block = 15 blocks, each ending in the sync marker
    assert data.count(sync) >= 15 + 1  # header copy + one per block
    assert list(A.iter_ocf_rows(path)) == rows


# ---------------------------------------------------------------------------
# Spark round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_spark_roundtrip_all_types(spark, tmp_path, codec):
    A.register(spark)
    out = str(tmp_path / f"typed_{codec}")
    df = spark.createDataFrame(_typed_rows(), SCHEMA_DDL)
    df.write.format("avro_py").option("codec", codec).mode("append").save(out)

    back = spark.read.format("avro_py").load(out)
    assert [f.simpleString() for f in back.schema.fields] == [
        f.simpleString() for f in df.schema.fields
    ]
    want = sorted(map(repr, df.collect()))
    got = sorted(map(repr, back.collect()))
    assert got == want


def test_schema_embedded_not_guessed(spark, tmp_path):
    A.register(spark)
    out = str(tmp_path / "docs")
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 3.5)], "doc_id long, lang string, score double"
    )
    df.write.format("avro_py").mode("append").save(out)
    back = spark.read.format("avro_py").load(out)
    assert dict((f.name, f.dataType.simpleString()) for f in back.schema.fields) == {
        "doc_id": "bigint",
        "lang": "string",
        "score": "double",
    }


def test_manifest_commit_protocol(spark, tmp_path):
    A.register(spark)
    out = str(tmp_path / "mf")
    df = spark.createDataFrame([(i,) for i in range(40)], "x long").repartition(4)
    df.write.format("avro_py").mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    parts = {f for f in os.listdir(out) if f.startswith("part-")}
    assert set(manifest["files"]) == parts and manifest["rows"] == 40
    # one reader partition per committed file — write parallelism preserved
    back = spark.read.format("avro_py").load(out)
    assert back.rdd.getNumPartitions() == len(parts)
    assert back.count() == 40


def test_overwrite_replaces(spark, tmp_path):
    A.register(spark)
    out = str(tmp_path / "ow")
    spark.createDataFrame([(i,) for i in range(30)], "x long").write.format(
        "avro_py"
    ).mode("append").save(out)
    spark.createDataFrame([(i,) for i in range(5)], "x long").write.format(
        "avro_py"
    ).mode("overwrite").save(out)
    assert spark.read.format("avro_py").load(out).count() == 5


def test_deflate_compresses(spark, tmp_path):
    A.register(spark)
    rows = [(i, "the same boilerplate sentence repeated many times over") for i in range(2000)]
    sizes = {}
    for codec in ("null", "deflate"):
        out = str(tmp_path / codec)
        spark.createDataFrame(rows, "i long, t string").coalesce(1).write.format(
            "avro_py"
        ).option("codec", codec).mode("append").save(out)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".avro")
        )
        got = sorted(spark.read.format("avro_py").load(out).collect())
        assert [tuple(r) for r in got] == rows
    assert sizes["deflate"] < sizes["null"] / 3


def test_events_table_roundtrip_vs_parquet(spark):
    """The engine-table fidelity check: every events row (long, ts,
    string, double) survives parquet -> avro_py -> Spark byte-for-byte."""
    A.register(spark)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    out = "/tmp/_avro_events_rt"
    src.write.format("avro_py").option("codec", "deflate").mode("overwrite").save(out)
    back = spark.read.format("avro_py").load(out)
    assert sorted(map(repr, back.collect())) == sorted(map(repr, src.collect()))


def test_unsupported_types_raise(spark, tmp_path):
    A.register(spark)
    df = spark.createDataFrame([({"k": 1},)], "m map<string,int>")
    with pytest.raises(Exception, match="does not support|NotImplemented"):
        df.write.format("avro_py").mode("append").save(str(tmp_path / "bad"))


def test_block_split_partitions(spark, tmp_path):
    """One coalesced file must still fan out across reader partitions
    via the manifest's block index, with identical rows."""
    A.register(spark)
    out = str(tmp_path / "split")
    rows = [(i, f"text {i} " * 10) for i in range(5000)]
    df = spark.createDataFrame(rows, "i long, t string").coalesce(1)
    df.write.format("avro_py").option("block_rows", "250").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    (fname,) = manifest["files"]
    assert len(manifest["file_blocks"][fname]) == 20  # 5000 / 250

    whole = spark.read.format("avro_py").load(out)
    split = spark.read.format("avro_py").option("split_bytes", "8192").load(out)
    assert whole.rdd.getNumPartitions() == 1 or whole.rdd.getNumPartitions() >= 1
    assert split.rdd.getNumPartitions() > 4  # block ranges, one file
    got = sorted(tuple(r) for r in split.collect())
    assert got == rows
    # block ranges cover every block exactly once, no overlap
    assert split.count() == whole.count() == 5000


def test_block_split_deflate_roundtrip(spark, tmp_path):
    A.register(spark)
    out = str(tmp_path / "splitz")
    rows = [(i,) for i in range(3000)]
    spark.createDataFrame(rows, "x long").coalesce(1).write.format("avro_py").option(
        "codec", "deflate"
    ).option("block_rows", "100").mode("append").save(out)
    split = spark.read.format("avro_py").option("split_bytes", "1").load(out)
    # split_bytes=1 -> one partition per block
    assert split.rdd.getNumPartitions() == 30
    assert sorted(r.x for r in split.collect()) == list(range(3000))


def test_stream_write_matches_batch(spark, tmp_path):
    """Streaming Avro sink: per-epoch manifests, decodable with the
    plain OCF reader, rows identical to the batch input."""
    A.register(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = [(i, f"txt {i}") for i in range(60)]
    schema = "i long, t string"
    spark.createDataFrame(rows, schema).repartition(3).write.parquet(src)

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.format("avro_py")
        .option("path", out)
        .option("codec", "deflate")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    epochs = [f for f in os.listdir(out) if f.startswith("_MANIFEST-")]
    assert epochs, "streaming write must commit at least one epoch manifest"
    files = set()
    for e in epochs:
        files.update(json.load(open(os.path.join(out, e)))["files"])
    got = []
    for fname in files:
        got.extend(A.iter_ocf_rows(os.path.join(out, fname)))
    assert sorted(got) == rows


def test_append_merges_manifest(spark, tmp_path):
    A.register(spark)
    out = str(tmp_path / "app")
    spark.createDataFrame([(i,) for i in range(30)], "x long").write.format(
        "avro_py"
    ).mode("append").save(out)
    spark.createDataFrame([(i,) for i in range(100, 105)], "x long").write.format(
        "avro_py"
    ).mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 35
    got = {r["x"] for r in spark.read.format("avro_py").load(out).collect()}
    assert got == set(range(30)) | set(range(100, 105))


def test_overwrite_preserves_old_data_until_commit(spark, tmp_path):
    """The commit point is the atomic _MANIFEST replace — planning a
    second overwrite job must not touch the first job's files."""
    A.register(spark)
    out = str(tmp_path / "atomic")
    spark.createDataFrame([(1,)], "x long").write.format("avro_py").mode(
        "overwrite"
    ).save(out)
    ds = A.AvroOcfDataSource({"path": out})
    from pyspark.sql.types import LongType, StructField, StructType

    ds.writer(StructType([StructField("x", LongType())]), overwrite=True)
    # planning a writer deleted nothing
    assert spark.read.format("avro_py").load(out).collect()[0]["x"] == 1


def test_batch_read_of_streamed_dir(spark, tmp_path):
    """spark.read over a streaming-sink directory unions the per-epoch
    manifests (no _MANIFEST file exists there)."""
    A.register(spark)
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    rows = [(i,) for i in range(50)]
    spark.createDataFrame(rows, "i long").repartition(2).write.parquet(src)
    q = (
        spark.readStream.schema("i long")
        .parquet(src)
        .writeStream.format("avro_py")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    got = sorted(r["i"] for r in spark.read.format("avro_py").load(out).collect())
    assert got == list(range(50))


def test_timestamp_codec_matches_spark_boundary_non_utc():
    """TimestampType crosses the Python boundary as naive OS-LOCAL
    datetimes; the codec must invert TimestampType.toInternal exactly,
    in any zone (regression: naive values were treated as UTC)."""
    import time as _time
    from datetime import datetime

    from pyspark.sql.types import StructField, StructType, TimestampType

    sch = A.spark_schema_to_avro(
        StructType([StructField("ts", TimestampType(), False)])
    )
    t = sch["fields"][0]["type"]
    enc = A._compile_encoder(t)
    dec = A._compile_decoder(t)
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        naive = datetime(2025, 6, 1, 12, 0, 0, 123456)  # EDT wall clock
        internal = TimestampType().toInternal(naive)  # Spark's own micros
        out = bytearray()
        enc(naive, out)
        got, _ = A._dec_long(memoryview(bytes(out)), 0)
        assert got == internal  # instant written == Spark's internal micros
        back, _ = dec(memoryview(bytes(out)), 0)
        assert back == TimestampType().fromInternal(internal) == naive
    finally:
        if old_tz is None:
            del os.environ["TZ"]
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()


def test_header_metadata_past_64k(tmp_path):
    """A conformant foreign OCF whose header metadata exceeds 64 KiB
    (e.g. a huge schema doc) must still parse."""
    sch = {
        "type": "record",
        "name": "r",
        "doc": "x" * (1 << 17),  # 128 KiB of metadata
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "big_header.avro")
    A.write_rows_local(p, sch, [(7,), (8,)])
    rows = list(A.iter_ocf_rows(p))
    assert rows == [(7,), (8,)]


def test_property_roundtrip_random_rows():
    """Hypothesis: write_ocf → iter_ocf_rows is the identity for random
    rows over the supported primitive/array/null surface."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "raw", "type": "bytes"},
        ],
    }
    row = st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.none() | st.text(max_size=40),
        st.floats(allow_nan=False),
        st.booleans(),
        st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        st.binary(max_size=32),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(row, max_size=25), st.sampled_from(["null", "deflate"]))
    def check(rows, codec):
        import io

        buf = io.BytesIO()
        A.write_ocf(buf, sch, iter(rows), codec, block_rows=7)
        buf.seek(0)
        sch_back, codec_back, sync, pos = A.read_ocf_header(buf)
        assert codec_back == codec
        import tempfile, os as _os

        with tempfile.NamedTemporaryFile(suffix=".avro", delete=False) as f:
            f.write(buf.getvalue())
            p = f.name
        try:
            got = list(A.iter_ocf_rows(p))
        finally:
            _os.unlink(p)
        assert got == [tuple(r) for r in rows]

    check()


def test_batch_append_then_stream_epochs_stay_visible(spark, tmp_path):
    """A batch append into a streamed directory must not freeze the
    visible file set: epoch manifests committed AFTER the append (here:
    simulated by writing a _MANIFEST-<N> next to an existing _MANIFEST)
    are unioned into batch reads, not shadowed by the batch manifest."""
    A.register(spark)
    out = str(tmp_path / "mix")
    spark.createDataFrame([(i,) for i in range(10)], "x long").coalesce(1).write.format(
        "avro_py"
    ).mode("append").save(out)
    assert os.path.exists(os.path.join(out, "_MANIFEST"))
    # a later stream epoch: one more committed file + its epoch manifest
    fname = "part-streamed-epoch7.avro"
    A.write_rows_local(
        os.path.join(out, fname), {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": "long"}]}, [(i,) for i in range(10, 15)]
    )
    with open(os.path.join(out, "_MANIFEST-7"), "w") as f:
        json.dump({"files": [fname], "rows": 5, "file_rows": {fname: 5}}, f)
    got = sorted(r["x"] for r in spark.read.format("avro_py").load(out).collect())
    assert got == list(range(15))
    # and rows in the unioned view don't double-count a twice-listed file
    m = A._read_manifest(out)
    assert m["rows"] == 15


def test_manifest_rows_dedup_on_replayed_epoch(tmp_path):
    """An epoch replay re-listing a file elsewhere committed must not
    double-count rows: rows derive from the deduplicated file set."""
    out = tmp_path / "dup"
    out.mkdir()
    sch = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    A.write_rows_local(str(out / "a.avro"), sch, [(1,), (2,)])
    for epoch, files in [(1, ["a.avro"]), (2, ["a.avro"])]:
        with open(out / f"_MANIFEST-{epoch}", "w") as f:
            json.dump({"files": files, "rows": 2, "file_rows": {"a.avro": 2}}, f)
    m = A._read_manifest(str(out))
    assert m["files"] == ["a.avro"] and m["rows"] == 2


def test_manifest_rows_mixed_legacy_and_new_no_double_count(tmp_path):
    """A file listed by BOTH a legacy manifest (pre-file_rows: only an
    aggregate ``rows`` total) and a newer manifest that carries
    file_rows must be counted once (ADVICE r03): the legacy aggregate
    already includes it, so the file_rows sum subtracts the overlap."""
    out = tmp_path / "mixed"
    out.mkdir()
    sch = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    A.write_rows_local(str(out / "a.avro"), sch, [(1,), (2,)])
    A.write_rows_local(str(out / "b.avro"), sch, [(3,), (4,), (5,)])
    # legacy epoch: lists a.avro with aggregate rows only
    with open(out / "_MANIFEST-1", "w") as f:
        json.dump({"files": ["a.avro"], "rows": 2}, f)
    # newer epoch: replays a.avro AND adds b.avro, with file_rows
    with open(out / "_MANIFEST-2", "w") as f:
        json.dump(
            {"files": ["a.avro", "b.avro"], "rows": 5,
             "file_rows": {"a.avro": 2, "b.avro": 3}}, f
        )
    m = A._read_manifest(str(out))
    assert sorted(m["files"]) == ["a.avro", "b.avro"]
    assert m["rows"] == 5  # was 7 before the overlap subtraction


def test_negative_byte_length_raises_not_loops():
    """A corrupt negative length in header metadata must raise, not
    parse 'successfully' with a backwards-moving cursor."""
    import io

    # magic + map count 1 + key with negative zigzag length (-5 -> 9)
    bad = b"Obj\x01" + b"\x02" + b"\x09"
    with pytest.raises(ValueError, match="negative|corrupt|truncated"):
        A.read_ocf_header(io.BytesIO(bad))
