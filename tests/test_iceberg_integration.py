"""Iceberg-readiness integration test (VERDICT r04 item 7).

The north rule targets Iceberg tables; this sandbox ships no
iceberg-spark-runtime jar and has no network to fetch one, so the
TableFormat seam (lnex_spark/sources/tableformat.py) has only ever
executed its parquet arm here.  This module is the proof the seam
compiles against the REAL catalog API the day a jar appears:

* offline (no jar): every test skips with an explicit reason — the
  gate is jar discovery, not an env flag someone must remember to set;
* with ``iceberg-spark-runtime-*.jar`` on the classpath (dropped into
  ``$SPARK_HOME/jars`` / pyspark's ``jars/`` dir, or named via
  ``$ICEBERG_SPARK_JAR``): the tests auto-activate and drive
  ``write_table`` → ``writeTo(...).using('iceberg')`` create/append,
  catalog-name readback, and the snapshot-log metadata table — the
  exact calls jobs/run_kg.py's K2 write makes on a cluster.

Catalog confs are applied at RUNTIME on the shared session
(``spark.sql.catalog.*`` is resolved lazily at first catalog use, so
no session rebuild is needed) and removed afterwards.
"""

from __future__ import annotations

import glob
import os
import sys
import uuid
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_CATALOG = "lnex_it"


def _iceberg_jar() -> str | None:
    """Path of an iceberg-spark-runtime jar if one is discoverable."""
    explicit = os.environ.get("ICEBERG_SPARK_JAR")
    if explicit and os.path.isfile(explicit):
        return explicit
    candidates: list[str] = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        candidates.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        candidates.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    for d in candidates:
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


_JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason=(
        "iceberg-spark-runtime jar not on the classpath (offline sandbox; "
        "drop the jar into $SPARK_HOME/jars or set $ICEBERG_SPARK_JAR to "
        "auto-activate this integration test)"
    ),
)


@pytest.fixture
def iceberg_catalog(spark, tmp_path):
    """Configure a hadoop-type Iceberg catalog on the shared session,
    warehouse under tmp_path; tear the confs back out afterwards."""
    confs = {
        f"spark.sql.catalog.{_CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{_CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{_CATALOG}.warehouse": str(tmp_path / "warehouse"),
    }
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield _CATALOG
    finally:
        for k in confs:
            try:
                spark.conf.unset(k)
            except Exception:
                pass


def _table_name() -> str:
    return f"{_CATALOG}.db.t_{uuid.uuid4().hex[:8]}"


def test_write_table_create_and_readback(spark, iceberg_catalog):
    from lnex_spark.sources.tableformat import read_table, write_table

    df = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, "again")],
        "conv_id string, turn_idx int, text string",
    )
    name = _table_name()
    write_table(df, name, partition_cols=["conv_id"], mode="overwrite")
    back = read_table(spark, name)
    assert back.count() == 3
    assert set(back.columns) == {"conv_id", "turn_idx", "text"}


def test_write_table_append_adds_snapshot(spark, iceberg_catalog):
    from lnex_spark.sources.tableformat import read_table, write_table

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    name = _table_name()
    write_table(df, name, mode="overwrite")
    write_table(df, name, mode="append")
    assert read_table(spark, name).count() == 2
    # the snapshot log is the whole point of the format: create+append
    # must leave >= 2 snapshots readable through the metadata table
    snaps = spark.sql(f"SELECT snapshot_id FROM {name}.snapshots").count()
    assert snaps >= 2


def test_seam_routes_catalog_names_to_iceberg(spark, iceberg_catalog):
    """_iceberg_available flips once a catalog conf advertises Iceberg,
    so catalog-style names take the writeTo arm while path writes keep
    the parquet arm (both through the same seam entrypoint)."""
    from lnex_spark.sources import tableformat as tf

    # the fixture just set an iceberg catalog conf at runtime — the
    # seam's detector MUST see it (this is the regression this test
    # exists to catch; a tautological assert here would let the
    # parquet arm silently swallow catalog names)
    assert tf._iceberg_available(spark)
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    # path-style target must still write parquet, catalog or not
    out = str(Path(spark.conf.get(f"spark.sql.catalog.{_CATALOG}.warehouse")).parent / "plain")
    tf.write_table(df, out, mode="overwrite")
    assert spark.read.parquet(out).count() == 1
