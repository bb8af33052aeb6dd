"""Schema evolution across parquet file generations.

A 100 TB table is never written by one job: early files lack columns
later files carry.  These tests pin the two behaviors a long-lived
ingest relies on:

  * ``mergeSchema=true`` unions file schemas and nulls the missing
    columns — old files stay readable after the schema grows;
  * writes through the TableFormat seam remain readable when a new
    nullable column appears in a later append (the local stand-in
    for Iceberg schema evolution).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unions_columns(spark, tmp_path):
    base = str(tmp_path / "evo")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(base + "/gen=1")
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, name string, score double"
    ).write.parquet(base + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert len(rows) == 4
    # old-generation rows surface the new column as NULL
    assert rows[1]["score"] is None and rows[2]["score"] is None
    assert rows[3]["score"] == 30.0 and rows[4]["score"] == 40.0


def test_merge_schema_promotes_after_append(spark, tmp_path):
    """Filter + aggregate still work across generations: the grown
    column behaves as a normal nullable column end to end."""
    base = str(tmp_path / "evo2")
    spark.createDataFrame([(1, "x")], "id long, tag string").write.parquet(
        base + "/g1"
    )
    spark.createDataFrame(
        [(2, "y", "extra")], "id long, tag string, note string"
    ).write.parquet(base + "/g2")
    df = spark.read.option("mergeSchema", "true").parquet(base + "/g1", base + "/g2")
    got = (
        df.agg(
            F.count("*").alias("n"),
            F.count("note").alias("n_note"),
            F.sum(F.when(F.col("note").isNull(), 1).otherwise(0)).alias("n_null"),
        )
    ).collect()[0]
    assert (got["n"], got["n_note"], got["n_null"]) == (2, 1, 1)
