"""TableFormat seam (SURVEY.md §1.2): the north rule targets Iceberg
tables, but no Iceberg runtime jar ships in this sandbox. All reads
and writes go through these two functions; when
``spark.sql.catalog.*`` advertises an Iceberg catalog the writes
switch to ``writeTo(...).using('iceberg')`` (partition transforms
included), otherwise partitioned parquet with identical layout.

On a real cluster the transcripts table is Iceberg-partitioned by
``bucket(conv_id)`` so the extraction scan is split by file planning
and the mention_triples write is overwrite-by-partition (idempotent
resume, see operators.lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower() for k, v in confs)


def read_table(
    spark: SparkSession, path_or_table: str, data_format: str = "parquet"
) -> DataFrame:
    """Read a table by file path (local/sandbox) or catalog name
    (Iceberg cluster). ``data_format`` selects the file codec for
    path reads — parquet (default) or orc, both columnar with
    predicate pushdown + partition pruning."""
    if "/" in path_or_table or path_or_table.endswith((".parquet", ".orc")):
        return spark.read.format(data_format).load(path_or_table)
    return spark.read.table(path_or_table)


def write_table(
    df: DataFrame,
    path_or_table: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    data_format: str = "parquet",
) -> None:
    spark = df.sparkSession
    if "/" not in path_or_table and _iceberg_available(spark):
        writer = df.writeTo(path_or_table).using("iceberg")
        if partition_cols:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.format(data_format).save(path_or_table)
