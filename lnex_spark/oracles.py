"""Operator-level correctness pairs for the driver's DuckDB oracle.

Every implemented operator from SURVEY.md §2 gets a (Spark callable,
ANSI-SQL string) pair exercised on the driver's sf0.01 parquet tables
(region nation customer supplier part orders lineitem events documents
embeddings). Column names/aliases must match exactly between the two —
the driver hashes values after sorting columns by name.

Ops whose semantics aren't SQL-expressible (broadcast match structure,
Arrow matcher) appear in ``spark_queries`` only → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def _load_all_defs() -> None:
    """Import every lnex_spark.oracle_defs* module (registration side
    effects).  Sorted import order keeps registration deterministic;
    registration is name-keyed so order only matters for duplicates,
    which ``register`` treats as overwrite-by-name."""
    import importlib
    import pkgutil

    import lnex_spark

    names = sorted(
        m.name
        for m in pkgutil.iter_modules(lnex_spark.__path__)
        if m.name.startswith("oracle_defs")
    )
    for name in names:
        importlib.import_module(f"lnex_spark.{name}")


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_defs()
    from lnex_spark.oracle_fixups import FIXUPS, fix_spark

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in _QUERIES.items():
        spec = FIXUPS.get(name)
        if spec:
            out[name] = (
                lambda spark, sf_dir, _fn=fn, _spec=spec: fix_spark(_fn(spark, sf_dir), _spec)
            )
        else:
            out[name] = fn
    return out


def duckdb_sql() -> dict[str, str]:
    _load_all_defs()
    from lnex_spark.oracle_fixups import FIXUPS, fix_sql

    return {
        name: fix_sql(sql, FIXUPS[name]) if name in FIXUPS else sql
        for name, sql in _ORACLES.items()
    }
