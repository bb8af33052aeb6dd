"""Sixth oracle-registry module: table-maintenance and remaining
relational-surface polish.

  * merge_upsert_turns — MERGE INTO semantics (matched → update,
    not-matched → insert) expressed engine-neutrally as a full-outer
    coalesce merge; this is the Iceberg/Delta upsert path a KG
    maintenance job runs per batch, value-checked against DuckDB's
    native dialect of the same merge;
  * moving_avg_orders — sliding window frame
    (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW);
  * nth_value_orders — first_value / last_value / nth_value with an
    explicit unbounded frame (the default RANGE frame truncates
    last_value at CURRENT ROW in both engines — the classic gotcha);
  * nullsafe_join_events — null-safe equality join (Spark `eqNullSafe`
    ≙ ANSI IS NOT DISTINCT FROM) on a derived column that is NULL for
    a deterministic subset;
  * seq_zip_parts — sequence + zip_with higher-order array coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- MERGE INTO (upsert) semantics --------------------------------------
@register(
    "merge_upsert_turns",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderpriority AS prio
      FROM orders WHERE o_orderkey < 2000
    ),
    updates AS (
      -- floor(x*100+0.5)/100, NOT round(x,2): round() on derived double
      -- arithmetic is engine-divergent exactly at half-cent boundaries
      -- (r02 driver: k=1777 Spark 315754.29 vs DuckDB 315754.28 — Spark
      -- rounds the shortest decimal repr HALF_UP, DuckDB rounds the
      -- scaled binary).  The floor form is pure IEEE double ops, so both
      -- engines compute bit-identical cents.
      SELECT o_orderkey AS k,
             floor(o_totalprice * 1.1::DOUBLE * 100.0 + 0.5) / 100.0 AS price,
             '0-UPSERTED' AS prio
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
    )
    SELECT coalesce(u.k, b.k) AS k,
           floor(coalesce(u.price, b.price) * 100.0 + 0.5) / 100.0 AS price,
           coalesce(u.prio, b.prio) AS prio,
           CASE WHEN u.k IS NOT NULL AND b.k IS NOT NULL THEN 'updated'
                WHEN u.k IS NOT NULL THEN 'inserted'
                ELSE 'kept' END AS action
    FROM base b FULL OUTER JOIN updates u ON b.k = u.k
    """,
)
def merge_upsert_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    updates = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)).select(
        F.col("o_orderkey").alias("k"),
        # same floor(x*100+0.5)/100 form as the oracle SQL — see the SQL
        # comment; F.round would HALF_UP on the shortest-repr decimal and
        # diverge from DuckDB at half-cent boundaries
        (F.floor(F.col("o_totalprice") * F.lit(1.1) * F.lit(100.0) + F.lit(0.5)) / 100.0).alias(
            "price"
        ),
        F.lit("0-UPSERTED").alias("prio"),
    )
    b, u = base.alias("b"), updates.alias("u")
    return b.join(u, F.col("b.k") == F.col("u.k"), "full_outer").select(
        F.coalesce("u.k", "b.k").alias("k"),
        (F.floor(F.coalesce("u.price", "b.price") * F.lit(100.0) + F.lit(0.5)) / 100.0).alias(
            "price"
        ),
        F.coalesce("u.prio", "b.prio").alias("prio"),
        F.when(F.col("u.k").isNotNull() & F.col("b.k").isNotNull(), "updated")
        .when(F.col("u.k").isNotNull(), "inserted")
        .otherwise("kept")
        .alias("action"),
    )


# --- sliding window frame ------------------------------------------------
@register(
    "moving_avg_orders",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
    FROM orders WHERE o_custkey < 120
    """,
)
def moving_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 120)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma4"),
    )


# --- first/last/nth_value with explicit unbounded frame ------------------
@register(
    "nth_value_orders",
    """
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER w, 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders WHERE o_custkey < 120
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def nth_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 120)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


# --- null-safe equality join --------------------------------------------
@register(
    "nullsafe_join_events",
    """
    WITH e AS (
      SELECT event_id,
             CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id % 7 END AS grp
      FROM events WHERE event_id < 3000
    ),
    d AS (SELECT unnest([NULL, 0, 1, 2, 3]) AS grp, unnest(['null-grp','g0','g1','g2','g3']) AS grp_name)
    SELECT e.event_id, d.grp_name
    FROM e JOIN d ON e.grp IS NOT DISTINCT FROM d.grp
    """,
)
def nullsafe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    e = ev.select(
        "event_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(F.col("user_id") % 7).alias("grp"),
    )
    d = spark.createDataFrame(
        [(None, "null-grp"), (0, "g0"), (1, "g1"), (2, "g2"), (3, "g3")],
        "grp long, grp_name string",
    )
    return e.join(F.broadcast(d), e["grp"].eqNullSafe(d["grp"])).select("event_id", "grp_name")


# --- sequence + zip_with higher-order arrays ----------------------------
@register(
    "seq_zip_parts",
    """
    WITH p AS (SELECT p_partkey, p_size FROM part WHERE p_partkey < 200 AND p_size >= 3)
    SELECT p_partkey, unnest(
      list_transform(range(1, p_size + 1), i -> i * p_partkey)
    ) AS scaled
    FROM p
    """,
)
def seq_zip_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_partkey") < 200) & (F.col("p_size") >= 3))
        .select("p_partkey", "p_size")
    )
    # sequence(1, p_size) zipped against a same-length partkey array —
    # exercises sequence + zip_with; equals i * p_partkey elementwise
    seq = F.sequence(F.lit(1), F.col("p_size"))
    scaled = F.zip_with(
        seq,
        F.transform(seq, lambda _: F.col("p_partkey")),
        lambda a, b: a * b,
    )
    return p.select("p_partkey", F.explode(scaled).alias("scaled"))
