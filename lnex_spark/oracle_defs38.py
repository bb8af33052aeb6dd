"""Thirty-eighth oracle-registry module: keyset pagination, period
deltas, and sequence-gap integrity.

  * keyset_pagination_orders — keyset (seek-method) pagination: page 6
    of orders under a total (o_orderdate, o_orderkey) order, fetched
    with a tuple-comparison predicate from the previous page's last
    key.  The DuckDB twin uses LIMIT/OFFSET — the value-hash match IS
    the keyset ≡ offset proof, on the order every serving layer cares
    about (keyset stays O(page) under an index where OFFSET scans and
    discards).
  * wow_change_events — week-over-week percent change of weekly
    totals: the reporting delta shape (one lag over the
    week-count-sized aggregate).
  * gap_detection_synth — missing-turn integrity check over the
    custom Python Data Source with a deterministic loss rule injected
    (drop turn_idx ≡ 3 mod 7 in even conversations): per damaged
    conversation the missing-index count and first missing index,
    via a generated expected-range anti-join.  T1's contiguity
    assumption, made auditable — the intake check a transcript
    pipeline runs before trusting turn ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- keyset pagination ≡ offset pagination ---------------------------------
_KEYSET_SQL = """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR) AS od
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 100
"""


@register("keyset_pagination_orders", _KEYSET_SQL)
def keyset_pagination_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch page 6 (rows 101-120) the keyset way: take the page-5
    boundary key (row 100 under the total order), then filter
    (o_orderdate, o_orderkey) strictly beyond it and take the next
    20.  The boundary comes from a rank pick here (a real pager
    carries it from the previous response); the page fetch itself
    never ranks the table."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.orderBy("o_orderdate", "o_orderkey")
    boundary = (
        o.select(
            "o_orderdate", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 100)
        .select(
            F.col("o_orderdate").alias("bd"), F.col("o_orderkey").alias("bk")
        )
    )
    page = (
        o.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("o_orderdate") > F.col("bd"))
            | (
                (F.col("o_orderdate") == F.col("bd"))
                & (F.col("o_orderkey") > F.col("bk"))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )
    return page.select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("string").alias("od")
    )


# --- week-over-week percent change -----------------------------------------
_WOW_SQL = """
    WITH weekly AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk,
             sum(value) AS total, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT wk, n, round(total, 6) AS total,
           round((total - lag(total) OVER (ORDER BY wk))
                 / lag(total) OVER (ORDER BY wk), 6) AS wow_change
    FROM weekly
"""


@register("wow_change_events", _WOW_SQL)
def wow_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') DIV 7 AS BIGINT)"
            ).alias("wk")
        )
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
    )
    w = Window.orderBy("wk")
    prev = F.lag("total").over(w)
    return weekly.select(
        "wk",
        "n",
        F.round("total", 6).alias("total"),
        F.round((F.col("total") - prev) / prev, 6).alias("wow_change"),
    )


# --- sequence-gap integrity over the synth source --------------------------
_GAP_SQL = """
    WITH convs AS (SELECT unnest(range(0, 50)) AS i),
    turns AS (SELECT unnest(range(0, 21)) AS j),
    t AS (
      SELECT 'c' || i AS conv_id, i, CAST(j AS INT) AS turn_idx
      FROM convs CROSS JOIN turns
      WHERE NOT (j % 7 = 3 AND i % 2 = 0)
    ),
    ext AS (
      SELECT conv_id, max(turn_idx) AS mx, count(*) AS n
      FROM t GROUP BY conv_id
    ),
    expected AS (
      SELECT conv_id, CAST(e AS INT) AS turn_idx
      FROM ext, unnest(range(0, mx + 1)) AS r(e)
    ),
    missing AS (
      SELECT e.conv_id, e.turn_idx FROM expected e
      WHERE NOT EXISTS (SELECT 1 FROM t
                        WHERE t.conv_id = e.conv_id
                          AND t.turn_idx = e.turn_idx)
    )
    SELECT conv_id, count(*) AS n_missing,
           min(turn_idx) AS first_missing
    FROM missing GROUP BY conv_id
"""


@register("gap_detection_synth", _GAP_SQL)
def gap_detection_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject a deterministic loss rule into the synth transcript read
    (drop turn_idx ≡ 3 mod 7 in even conversations), then detect the
    damage: expected indices 0..max per conversation generated with
    sequence+explode (no shuffle to build the spine), anti-joined
    against the surviving turns.  Only damaged conversations report;
    trailing truncation is invisible by construction (max is taken
    from surviving data) — the op checks CONTIGUITY, not length."""
    from lnex_spark.sources import synth

    synth.register(spark)
    df = (
        spark.read.format("transcripts_synth")
        .option("n_convs", 50)
        .option("turns_per_conv", 21)
        .option("num_partitions", 4)
        .load()
    )
    cnum = F.substring("conv_id", 2, 10).cast("int")
    t = df.filter(
        ~((F.col("turn_idx") % 7 == 3) & (cnum % 2 == 0))
    ).select("conv_id", "turn_idx")
    ext = t.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    expected = ext.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("turn_idx"),
    )
    missing = expected.join(t, ["conv_id", "turn_idx"], "left_anti")
    return missing.groupBy("conv_id").agg(
        F.count("*").alias("n_missing"), F.min("turn_idx").alias("first_missing")
    )
