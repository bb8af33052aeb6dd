"""Twenty-second oracle-registry module: data-quality expectations
and space-filling-curve layout keys.

  * dq_profile_docs — the expectations report a training-data intake
    job runs before accepting a corpus drop: per-column null counts,
    distinct counts, and pass/fail booleans for declared constraints
    (null-rate bound, value-range bound). One narrow report row per
    column via UNION ALL of per-column aggregates — Catalyst shares
    the scan; at 100 TB each branch is a partial+final agg over the
    same cached columnar read. Identical SQL both engines.
  * zorder_key_cells — Morton/Z-order interleave of two bounded cell
    coordinates into one locality key: the layout trick behind
    clustered table writes (rows near in 2-D space land near in the
    1-D sort, so min/max file statistics prune 2-D range queries).
    The 8-bit-per-axis interleave is written as pure integer
    div/mod/multiply arithmetic — no engine bit operators — from one
    generated template (Spark spells integer division `DIV`, DuckDB
    `//`), so both engines compute bit-identical keys. Completes the
    geo sharding story begun by geo_grid_cells (oracle_defs9): grid
    cell → Z key → range bucket is the planet-scale gazetteer
    partitioning pipeline.

Reference parity note: LNEx has neither data-quality gates nor
storage layout [SURVEY.md §0]; both ops are host-engine
infrastructure for the 100 TB deployment of its semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DQ_SQL = """
    SELECT 'text' AS col, count(*) AS n,
           count(*) - count(text) AS n_null,
           count(DISTINCT text) AS n_distinct,
           (count(*) - count(text)) * 100 <= count(*) AS null_rate_ok,
           min(length(text)) >= 0 AS range_ok
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           (count(*) - count(lang)) * 100 <= count(*),
           min(length(lang)) BETWEEN 2 AND 8
    FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
           (count(*) - count(source)) * 100 <= count(*),
           TRUE
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
           (count(*) - count(n_chars)) * 100 <= count(*),
           min(n_chars) >= 0 AND max(n_chars) <= 1000000
    FROM documents
"""


@register("dq_profile_docs", _DQ_SQL)
def dq_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_DQ_SQL)


def _zorder_template(div: str) -> str:
    """8-bit x 8-bit Morton interleave in portable integer arithmetic:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(8):
        terms.append(f"((xb {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((yb {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    z = " + ".join(terms)
    return f"""
    WITH cells AS (
      SELECT c_custkey,
             c_custkey % 256 AS xb,
             (c_custkey * 7919) % 256 AS yb
      FROM customer WHERE c_custkey % 11 = 0
    )
    SELECT c_custkey, xb, yb,
           {z} AS zkey,
           ({z}) {div} 1024 AS zbucket
    FROM cells
    """


@register("zorder_key_cells", _zorder_template("//"))
def zorder_key_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_zorder_template("DIV"))
