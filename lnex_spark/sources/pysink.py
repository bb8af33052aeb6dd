"""Python Data Source *writer* (Spark 4 ``pyspark.sql.datasource``):
the sink half of the custom-source seam (``sources/synth.py`` is the
read half — together they cover the full Python Data Source API).

``df.write.format("jsonl_sink").save(path)`` writes one newline-JSON
part file per task, then commits atomically via a driver-side
manifest:

* executors never write to the final name — each task writes
  ``part-<partitionId>-<taskAttemptId>.jsonl`` and returns the name
  in its WriterCommitMessage;
* ``commit()`` (driver, once, only after every task succeeded) writes
  ``_MANIFEST`` listing exactly the committed files. Readers that
  honor the manifest see either the whole write or nothing — the
  same files-then-manifest protocol Iceberg/Delta use, scaled down;
* ``abort()`` best-effort removes the orphan part files; a reader
  consulting ``_MANIFEST`` would ignore them even if removal loses
  the race.
* speculative/retried tasks are safe: the attempt id is in the file
  name, and only the attempt whose message reaches ``commit()`` lands
  in the manifest.

The streaming twin (``DataSourceStreamWriter``) appends a
``_MANIFEST-<epoch>`` per micro-batch — committed epochs are exactly
the manifests present, giving idempotent exactly-once file output
under checkpoint replay (a replayed epoch overwrites its own
manifest).

At 100 TB: the write path is embarrassingly parallel (no shuffle, no
driver data movement; the driver sees only file names), which is the
property that matters — the JSONL encoding itself is a stand-in for
any columnar/external sink.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FileMsg(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _write_partition(path: str, it: Iterator, field_names: list[str]) -> _FileMsg:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    fname = f"part-{ctx.partitionId()}-{ctx.taskAttemptId()}.jsonl"
    os.makedirs(path, exist_ok=True)
    n = 0
    with open(os.path.join(path, fname), "w") as f:
        for row in it:
            f.write(json.dumps(dict(zip(field_names, row)), default=str) + "\n")
            n += 1
    return _FileMsg(fname, n)


def _write_manifest(path: str, name: str, messages) -> None:
    manifest = {
        "files": sorted(m.filename for m in messages),
        "rows": sum(m.n_rows for m in messages),
    }
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, name))


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, path: str, field_names: list[str]):
        self.path = path
        self.field_names = field_names

    def write(self, it: Iterator) -> _FileMsg:
        return _write_partition(self.path, it, self.field_names)

    def commit(self, messages) -> None:
        _write_manifest(self.path, "_MANIFEST", messages)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str, field_names: list[str]):
        self.path = path
        self.field_names = field_names

    def write(self, it: Iterator) -> _FileMsg:
        return _write_partition(self.path, it, self.field_names)

    def commit(self, messages, batchId: int) -> None:
        _write_manifest(self.path, f"_MANIFEST-{batchId}", messages)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    """Registered as ``jsonl_sink``; ``path`` option or save(path)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlBatchWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires a path")
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                os.remove(os.path.join(path, f))
        return JsonlBatchWriter(path, [f.name for f in schema.fields])

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlStreamWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires a path")
        return JsonlSinkDataSource._stream_writer(path, schema)

    @staticmethod
    def _stream_writer(path: str, schema: StructType) -> JsonlStreamWriter:
        return JsonlStreamWriter(path, [f.name for f in schema.fields])


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def read_manifested(path: str) -> list[dict]:
    """Reader honoring the commit protocol: rows from manifested files
    only (batch ``_MANIFEST`` and any streaming ``_MANIFEST-<epoch>``),
    ignoring uncommitted part files."""
    files: set[str] = set()
    for entry in os.listdir(path):
        if entry == "_MANIFEST" or entry.startswith("_MANIFEST-"):
            with open(os.path.join(path, entry)) as f:
                files.update(json.load(f)["files"])
    rows: list[dict] = []
    for fname in sorted(files):
        with open(os.path.join(path, fname)) as f:
            rows.extend(json.loads(line) for line in f)
    return rows
