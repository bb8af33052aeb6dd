"""Schema-explicit transcript readers for the formats a reference user
might arrive with: parquet (canonical), CSV, JSONL. No schema
inference anywhere — inference re-reads the data and can silently
type-drift between runs, which breaks the per-turn text-equality
invariant the north rule demands.

Malformed rows are quarantined, not dropped: mode=PERMISSIVE with a
``_corrupt`` column, so a 100 TB ingest reports its reject count
instead of silently shrinking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_WITH_CORRUPT = T.StructType(TRANSCRIPT_SCHEMA.fields + [T.StructField("_corrupt", T.StringType(), True)])


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    ts_format: str | None = None,
) -> DataFrame:
    """Load a transcripts table in the canonical column order/types.

    fmt: parquet | csv (headered) | jsonl. Returns only well-formed
    rows; use :func:`read_transcripts_rejects` for the quarantine."""
    df = _read_raw(spark, path, fmt, ts_format)
    if "_corrupt" in df.columns:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    return df.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])


def read_transcripts_rejects(
    spark: SparkSession, path: str, fmt: str, ts_format: str | None = None
) -> DataFrame:
    """The malformed-row quarantine: raw text of every rejected line."""
    df = _read_raw(spark, path, fmt, ts_format)
    if "_corrupt" not in df.columns:
        return spark.createDataFrame([], "line string")
    # Spark disallows querying ONLY the corrupt-record column straight
    # off a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); caching
    # the parsed relation first is the documented workaround
    df = df.cache()
    return df.filter(F.col("_corrupt").isNotNull()).select(F.col("_corrupt").alias("line"))


def _read_raw(spark: SparkSession, path: str, fmt: str, ts_format: str | None) -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    if fmt == "csv":
        reader = (
            spark.read.schema(_WITH_CORRUPT)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            # CSV convention for parquet/jsonl parity: quoted "" reads
            # as empty string (emptyValue), null is spelled \N
            # (nullValue), and an UNQUOTED empty field is always null —
            # Spark's reader nulls those unconditionally, so producers
            # must quote empties to preserve text equality
            .option("nullValue", "\\N")
            .option("emptyValue", "")
        )
        if ts_format:
            reader = reader.option("timestampFormat", ts_format)
        return reader.csv(path)
    if fmt == "jsonl":
        reader = (
            spark.read.schema(_WITH_CORRUPT)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
        )
        if ts_format:
            reader = reader.option("timestampFormat", ts_format)
        return reader.json(path)
    raise ValueError(f"unknown transcripts format: {fmt!r} (parquet|csv|jsonl)")
