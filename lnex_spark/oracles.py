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


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lnex_spark import oracle_defs, oracle_defs2, oracle_defs3, oracle_defs4, oracle_defs5, oracle_defs6, oracle_defs7, oracle_defs8, oracle_defs9, oracle_defs10, oracle_defs11, oracle_defs12, oracle_defs13, oracle_defs14, oracle_defs15, oracle_defs16, oracle_defs17, oracle_defs18, oracle_defs19, oracle_defs20, oracle_defs21, oracle_defs22, oracle_defs23, oracle_defs24, oracle_defs25, oracle_defs26, oracle_defs27, oracle_defs28, oracle_defs29, oracle_defs30, oracle_defs31, oracle_defs32, oracle_defs33, oracle_defs34, oracle_defs35, oracle_defs36, oracle_defs37, oracle_defs38, oracle_defs39, oracle_defs40, oracle_defs41, oracle_defs42, oracle_defs43, oracle_defs44, oracle_defs45, oracle_defs46, oracle_defs47  # noqa: F401  (registration side effects)

    return dict(_QUERIES)


def duckdb_sql() -> dict[str, str]:
    from lnex_spark import oracle_defs, oracle_defs2, oracle_defs3, oracle_defs4, oracle_defs5, oracle_defs6, oracle_defs7, oracle_defs8, oracle_defs9, oracle_defs10, oracle_defs11, oracle_defs12, oracle_defs13, oracle_defs14, oracle_defs15, oracle_defs16, oracle_defs17, oracle_defs18, oracle_defs19, oracle_defs20, oracle_defs21, oracle_defs22, oracle_defs23, oracle_defs24, oracle_defs25, oracle_defs26, oracle_defs27, oracle_defs28, oracle_defs29, oracle_defs30, oracle_defs31, oracle_defs32, oracle_defs33, oracle_defs34, oracle_defs35, oracle_defs36, oracle_defs37, oracle_defs38, oracle_defs39, oracle_defs40, oracle_defs41, oracle_defs42, oracle_defs43, oracle_defs44, oracle_defs45, oracle_defs46, oracle_defs47  # noqa: F401

    return dict(_ORACLES)
