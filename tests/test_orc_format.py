"""TableFormat seam: ORC as the alternate columnar codec — partitioned
write, pruned read-back, parity with the parquet layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from lnex_spark.sources.tableformat import read_table, write_table


def _triples(spark):
    return spark.range(0, 400).select(
        F.concat(F.lit("c"), F.col("id")).alias("subj"),
        F.lit("mentionsLocation").alias("pred"),
        (F.col("id") % 7).alias("obj"),
    )


def test_orc_roundtrip_partitioned(spark, tmp_path):
    t = _triples(spark)
    out = str(tmp_path / "triples_orc")
    write_table(t, out, partition_cols=["obj"], data_format="orc")
    back = read_table(spark, out, data_format="orc")
    assert sorted(map(tuple, back.select("subj", "pred", "obj").collect())) == sorted(
        map(tuple, t.collect())
    )
    # partition pruning reaches the scan
    pruned = back.where(F.col("obj") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == t.where(F.col("obj") == 3).count() == 57


def test_orc_parquet_identical_rows(spark, tmp_path):
    t = _triples(spark)
    po, pq = str(tmp_path / "o"), str(tmp_path / "p")
    write_table(t, po, data_format="orc")
    write_table(t, pq, data_format="parquet")
    a = sorted(map(tuple, read_table(spark, po, data_format="orc").collect()))
    b = sorted(map(tuple, read_table(spark, pq).collect()))
    assert a == b
