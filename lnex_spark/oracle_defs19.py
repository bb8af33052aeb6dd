"""Nineteenth oracle-registry module: the Spark-4 SQL *authoring*
surface — the ways a user writes queries, not new relational algebra.
Each op exercises one authoring mechanism on the Spark side and is
value-hash-verified against a classic-SQL DuckDB re-derivation, so
the mechanism itself (parser/analyzer feature) is what's under test:

  * pipe_syntax_pricing   — SQL pipe syntax (``FROM t |> WHERE |>
    AGGREGATE``, Spark 4.0): the Q1 pricing summary authored as a
    pipeline; oracle is the classic GROUP BY form. Integer-cent sums
    keep the compare exact.
  * collation_ci_brands   — string collations (``COLLATE
    UTF8_LCASE``): case-insensitive GROUP BY over a deliberately
    case-mangled brand column. The group key is the collated
    expression; outputs are deterministic projections of the class
    (``lower``) and the binary-collation ``min`` of the raw strings.
    Oracle groups by ``lower()``.
  * sql_udf_netprice      — declarative SQL UDF (``CREATE TEMPORARY
    FUNCTION ... RETURN expr``): net-price math behind a named
    function. Catalyst inlines the body, so the plan is identical to
    writing the expression — the op pins that a SQL UDF stays on the
    codegen fast path (no Python boundary). Oracle inlines the body.
  * param_query_segment   — parameterized ``spark.sql(..., args=)``
    with named markers (injection-safe literals); oracle is the same
    text with literals substituted.
  * interval_arith_orders — ANSI interval types: ``+ INTERVAL '3'
    MONTH`` (end-of-month clamping must agree), ``+ INTERVAL '45'
    DAY``, and day-granularity datediff.
  * identifier_union      — the ``IDENTIFIER(:t)`` clause: table
    names as *parameters* (safe dynamic SQL — the planner resolves
    the identifier, no string splicing). Per-table counts unioned.
  * sql_script_above_avg  — SQL scripting (``BEGIN DECLARE ... SET
    ... END``, Spark 4.0): a two-statement script that computes a
    corpus statistic into a variable and uses it in the final SELECT.
    Exact integer-cents cross-multiplication instead of a float
    average so the threshold comparison is engine-stable.
  * listagg_status        — ``listagg(...) WITHIN GROUP (ORDER BY)``
    (Spark 4.0 ANSI ordered string aggregation) over a deduped
    subquery; oracle uses DuckDB ``string_agg(... ORDER BY)``.
  * arrow_brand_stats     — grouped ``applyInArrow``: per-brand stats
    computed directly on pyarrow Tables (no pandas materialization —
    the zero-copy grouped-map path). Integer-cent sums keep pc.sum
    exact; completes the grouped half of the Arrow-native API pair
    with mapInArrow (oracle_defs17).

At scale: all of these compile to the same plans as their classic
spellings (pipe syntax, SQL UDFs, parameters and IDENTIFIER are
purely frontend), so the 100 TB story is inherited from the operators
they desugar to; collation comparisons run in the JVM via ICU keys,
and applyInArrow shuffles once on the group key like any grouped map.

Reference parity note: LNEx has no SQL frontend [SURVEY.md §0]; these
ops evidence the authoring surface of the engine the LNEx semantics
are grafted onto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- SQL pipe syntax ----------------------------------------------------
@register(
    "pipe_syntax_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS gross_cents,
           sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |> AGGREGATE
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS gross_cents,
             sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
             count(*) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, gross_cents, sum_qty, n
        """
    )


# --- case-insensitive collation -----------------------------------------
@register(
    "collation_ci_brands",
    """
    WITH mangled AS (
      SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_brand)
                  WHEN p_partkey % 3 = 1 THEN lower(p_brand)
                  ELSE p_brand END AS b,
             p_retailprice
      FROM part
    )
    SELECT lower(b) AS brand,
           min(b) AS min_raw,
           count(*) AS n,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS price_cents
    FROM mangled GROUP BY lower(b)
    """,
)
def collation_ci_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping under UTF8_LCASE merges case variants of the same
    brand into one group; every output column is a deterministic
    function of the equivalence class (lower / binary min / counts),
    never the engine's arbitrary pick of representative."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH mangled AS (
          SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_brand)
                      WHEN p_partkey % 3 = 1 THEN lower(p_brand)
                      ELSE p_brand END AS b,
                 p_retailprice
          FROM part
        )
        SELECT CAST(lower(b COLLATE UTF8_LCASE) AS STRING COLLATE UTF8_BINARY) AS brand,
               min(b) AS min_raw,
               count(*) AS n,
               sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS price_cents
        FROM mangled GROUP BY b COLLATE UTF8_LCASE
        """
    )


# --- declarative SQL UDF ------------------------------------------------
@register(
    "sql_udf_netprice",
    """
    SELECT l_returnflag,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                    AS BIGINT)) AS net_cents,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_netprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UDF body is inlined by the analyzer — same whole-stage
    codegen plan as the written-out expression, unlike any Python UDF."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(price * (1 - disc) * (1 + tax) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(net_cents(l_extendedprice, l_discount, l_tax)) AS net_cents,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    )


# --- parameterized queries ----------------------------------------------
@register(
    "param_query_segment",
    """
    SELECT c_custkey, c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000.0
    ORDER BY c_custkey
    LIMIT 50
    """,
)
def param_query_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
        WHERE c_mktsegment = :seg AND c_acctbal >= :minbal
        ORDER BY c_custkey
        LIMIT 50
        """,
        args={"seg": "BUILDING", "minbal": 1000.0},
    )


# --- ANSI interval arithmetic -------------------------------------------
@register(
    "interval_arith_orders",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL '3' MONTH AS DATE) AS review_due,
           CAST(o_orderdate + INTERVAL '45' DAY AS DATE) AS ship_by,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def interval_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month arithmetic must clamp end-of-month identically (Jan 31 +
    1 month = Feb 28/29 on both engines); day intervals are exact."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL '3' MONTH AS DATE) AS review_due,
               CAST(o_orderdate + INTERVAL '45' DAY AS DATE) AS ship_by,
               datediff(DATE '1998-12-31', CAST(o_orderdate AS DATE)) AS days_to_eoy
        FROM orders
        WHERE o_orderkey % 97 = 0
        """
    )


# --- IDENTIFIER clause: table names as parameters -----------------------
@register(
    "identifier_union",
    """
    SELECT 'region' AS tbl, count(*) AS n FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    """,
)
def identifier_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER(:t) resolves a *parameter* as a table name — the
    safe form of dynamic SQL (no string splicing, the analyzer treats
    the value as an identifier, not SQL text)."""
    out = None
    for name in ("region", "nation", "customer", "supplier"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
        part = spark.sql(
            "SELECT :label AS tbl, count(*) AS n FROM IDENTIFIER(:t)",
            args={"label": name, "t": name},
        )
        out = part if out is None else out.unionAll(part)
    return out


# --- SQL scripting ------------------------------------------------------
@register(
    "sql_script_above_avg",
    """
    WITH stats AS (
      SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS tot_cents,
             count(*) AS n
      FROM orders
    )
    SELECT o.o_orderpriority, count(*) AS n_above
    FROM orders o, stats s
    WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * s.n > s.tot_cents
    GROUP BY o.o_orderpriority
    """,
)
def sql_script_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-statement SQL script: corpus statistics land in DECLAREd
    variables, the final SELECT uses them. The above-average test is
    written as exact integer-cents cross-multiplication (price*n >
    total) so no float average can wobble the row set between engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE tot_cents BIGINT;
          DECLARE n_orders BIGINT;
          SET tot_cents = (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders);
          SET n_orders = (SELECT count(*) FROM orders);
          SELECT o_orderpriority, count(*) AS n_above
          FROM orders
          WHERE CAST(round(o_totalprice * 100) AS BIGINT) * n_orders > tot_cents
          GROUP BY o_orderpriority;
        END
        """
    )


# --- listagg WITHIN GROUP -----------------------------------------------
@register(
    "listagg_status",
    """
    WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
    SELECT o_orderpriority,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM d GROUP BY o_orderpriority
    """,
)
def listagg_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        SELECT o_orderpriority,
               listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        FROM d GROUP BY o_orderpriority
        """
    )


# --- grouped applyInArrow -----------------------------------------------
@register(
    "arrow_brand_stats",
    """
    SELECT p_brand,
           count(*) AS n,
           min(p_size) AS min_size,
           max(p_size) AS max_size,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS price_cents
    FROM part GROUP BY p_brand
    """,
)
def arrow_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow: the UDF sees each brand's rows as a
    pyarrow Table (zero-copy from the JVM batch, no pandas). One
    shuffle on the group key, like any grouped map; per-group math is
    exact int64 so the oracle compare has no float in it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    part = _t(spark, sf_dir, "part").selectExpr(
        "p_brand",
        "p_size",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS cents",
    )

    def stats(tbl: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "p_brand": pa.array([tbl.column("p_brand")[0].as_py()], pa.string()),
                "n": pa.array([tbl.num_rows], pa.int64()),
                "min_size": pa.array([pc.min(tbl.column("p_size")).as_py()], pa.int32()),
                "max_size": pa.array([pc.max(tbl.column("p_size")).as_py()], pa.int32()),
                "price_cents": pa.array([pc.sum(tbl.column("cents")).as_py()], pa.int64()),
            }
        )

    return part.groupBy("p_brand").applyInArrow(
        stats, schema="p_brand string, n long, min_size int, max_size int, price_cents long"
    )
