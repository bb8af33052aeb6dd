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
    # runtime SQL confs first: spark.sql.catalog.* is resolved lazily
    # at first catalog use, so a catalog registered via spark.conf.set
    # AFTER session start (the jar-gated integration test, notebook
    # sessions) is just as live as one baked into the SparkConf —
    # the static SparkContext conf alone would miss it
    try:
        confs = dict(spark.conf.getAll)
    except Exception:
        confs = {}
    if not confs:
        try:
            confs = dict(spark.sparkContext.getConf().getAll())
        except Exception:
            return False
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in confs.items()
    )


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


def compact_table(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    data_format: str = "parquet",
) -> int:
    """Small-file compaction: rewrite ``path`` into
    ceil(rows / target_rows_per_file) files. Returns the new file count.

    The streaming/micro-batch sinks and per-bucket resumable writes
    accumulate many small files; scan planning then pays per-file
    overhead and loses large sequential reads. On an Iceberg cluster
    this is ``CALL rewrite_data_files`` (transactional); the seam's
    local stand-in rewrites to a temp dir and swaps, so a reader never
    sees a half-compacted table directory.
    """
    import math
    import shutil
    import uuid

    df = spark.read.format(data_format).load(path)
    n = df.count()
    n_files = max(1, math.ceil(n / max(target_rows_per_file, 1)))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").format(data_format).save(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def write_snapshot(
    df: DataFrame,
    base: str,
    partition_cols: list[str] | None = None,
    data_format: str = "parquet",
) -> int:
    """Append a new immutable snapshot version under ``base`` and move
    the latest-pointer to it. Returns the new version number.

    Local stand-in for Iceberg's snapshot log: each write lands in
    ``base/v=N`` (never mutated afterwards), ``base/_latest`` names the
    current version, and old versions stay readable — giving
    time-travel (``read_snapshot(..., version=k)``) and instant
    rollback (rewrite the pointer) without a table-format runtime.
    """
    import os

    os.makedirs(base, exist_ok=True)
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    v = max(versions, default=0) + 1
    w = df.write.mode("errorifexists")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.format(data_format).save(f"{base}/v={v}")
    tmp = f"{base}/_latest.tmp"
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, f"{base}/_latest")  # atomic pointer move
    return v


def read_snapshot(
    spark: SparkSession,
    base: str,
    version: int | None = None,
    data_format: str = "parquet",
) -> DataFrame:
    """Read a snapshot table at ``version`` (default: latest)."""
    if version is None:
        with open(f"{base}/_latest") as f:
            version = int(f.read().strip())
    return spark.read.format(data_format).load(f"{base}/v={version}")


def rollback_snapshot(base: str, version: int) -> None:
    """Point the table back at an earlier snapshot (metadata-only)."""
    import os

    if not os.path.isdir(f"{base}/v={version}"):
        raise ValueError(f"snapshot v={version} does not exist under {base}")
    tmp = f"{base}/_latest.tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, f"{base}/_latest")


def expire_snapshots(base: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshot versions
    (never the one ``_latest`` points at) — the retention/VACUUM half
    of the snapshot log: time-travel history is bounded storage, so a
    long-running table periodically expires old versions exactly like
    Iceberg's ``expire_snapshots`` procedure. Returns the versions
    removed."""
    import os
    import shutil

    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    with open(f"{base}/_latest") as f:
        current = int(f.read().strip())
    doomed = [v for v in versions[:-keep_last] if v != current] if keep_last else [
        v for v in versions if v != current
    ]
    for v in doomed:
        shutil.rmtree(f"{base}/v={v}")
    return doomed
