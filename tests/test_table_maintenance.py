"""TableFormat maintenance: small-file compaction and snapshot
time-travel / rollback (the local stand-ins for Iceberg's
rewrite_data_files and snapshot log — SURVEY.md §1.2 seam).
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from lnex_spark.sources.tableformat import (
    compact_table,
    read_snapshot,
    rollback_snapshot,
    write_snapshot,
)


def _data_files(path):
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compaction_reduces_files_and_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # a fragmented table: 64 files for 1000 rows
    spark.range(1000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(path)
    before = spark.read.parquet(path)
    rows_before = sorted((r.id, r.v) for r in before.collect())
    assert len(_data_files(path)) == 64

    n_files = compact_table(spark, path, target_rows_per_file=500)
    assert n_files == 2
    assert len(_data_files(path)) == 2
    after = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert after == rows_before


def test_snapshot_append_time_travel_and_rollback(spark, tmp_path):
    base = str(tmp_path / "snap")
    df1 = spark.range(5).withColumn("tag", F.lit("v1"))
    df2 = spark.range(7).withColumn("tag", F.lit("v2"))

    assert write_snapshot(df1, base) == 1
    assert write_snapshot(df2, base) == 2

    assert read_snapshot(spark, base).count() == 7  # latest = v2
    assert {r.tag for r in read_snapshot(spark, base, version=1).collect()} == {"v1"}

    rollback_snapshot(base, 1)
    assert read_snapshot(spark, base).count() == 5  # pointer moved back
    # old snapshot untouched and still readable after rollback
    assert read_snapshot(spark, base, version=2).count() == 7

    with pytest.raises(ValueError):
        rollback_snapshot(base, 99)


def test_compression_codecs_roundtrip(spark, tmp_path):
    """Write-path codec coverage: zstd (best ratio for cold archives)
    and snappy (default, fastest scans) both round-trip; the codec is
    a per-write option, invisible to readers."""
    from pyspark.sql import functions as F

    df = spark.range(500).withColumn("v", F.col("id") * 3)
    rows = sorted((r.id, r.v) for r in df.collect())
    for codec in ("zstd", "snappy"):
        path = str(tmp_path / f"codec_{codec}")
        df.write.option("compression", codec).parquet(path)
        assert sorted((r.id, r.v) for r in spark.read.parquet(path).collect()) == rows


def test_expire_snapshots_retention(spark, tmp_path):
    """Retention bounds time-travel history: expire keeps the newest
    keep_last versions, never deletes the version _latest points at,
    and survivors stay readable."""
    from lnex_spark.sources.tableformat import expire_snapshots

    base = str(tmp_path / "snap")
    for i in range(1, 6):
        write_snapshot(spark.range(i).withColumn("tag", F.lit(f"v{i}")), base)

    removed = expire_snapshots(base, keep_last=2)
    assert removed == [1, 2, 3]
    assert read_snapshot(spark, base).count() == 5  # latest = v5 intact
    assert read_snapshot(spark, base, version=4).count() == 4

    # the current pointer target is never expired, even if old
    rollback_snapshot(base, 4)
    removed = expire_snapshots(base, keep_last=1)
    assert removed == []  # v5 is newest (kept), v4 is current (kept)
    assert read_snapshot(spark, base).count() == 4
