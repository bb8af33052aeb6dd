"""Seventy-seventh oracle-registry module: shard rebalancing and
referential integrity.

  * consistent_hash_events — the rebalancing argument for consistent
    hashing, measured: (user|type) keys are assigned to 4 and then 5
    shards under (a) mod-N hashing and (b) a consistent-hash ring
    (each shard owns 8 md5 virtual points; a key goes to the first
    ring point at or after its own hash, wrapping).  Emits the
    fraction of keys that MOVE when the fifth shard joins: mod-N
    reshuffles ~4/5 of all keys, the ring moves ~1/5 — the reason
    stateful shard maps (shuffle services, key-value stores,
    streaming state) use rings.  Pure md5 arithmetic, one pass.

  * ri_orphans_lineitem — the referential-integrity audit across the
    star schema's three FK edges (lineitem→orders, orders→customer,
    customer→nation): child counts, orphan counts via left-anti
    joins, and coverage rates.  The RI complement of fd_check_orders
    (functional dependencies) and dq_profile_docs (nulls/ranges);
    at warehouse scale each edge is one semi-join against the
    (broadcastable) parent key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_N_VNODES = 8

_RING_POINTS_SQL = " UNION ALL ".join(
    f"SELECT {s} AS shard, CAST(('0x' || substr(md5('vn{s}_{v}'), 1, 8)) AS BIGINT) AS pt"
    for s in range(5)
    for v in range(_N_VNODES)
)

_CH_SQL = f"""
    WITH keys AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type AS key FROM events
    ),
    hashed AS (
      SELECT key,
             CAST(('0x' || substr(md5('ring#' || key), 1, 8)) AS BIGINT) AS kh,
             CAST(('0x' || substr(md5('mod#' || key), 1, 4)) AS INTEGER) AS mh
      FROM keys
    ),
    ring AS ({_RING_POINTS_SQL}),
    ring4 AS (SELECT shard, pt FROM ring WHERE shard < 4),
    assign4 AS (
      SELECT h.key,
             COALESCE(
               (SELECT r.shard FROM ring4 r WHERE r.pt >= h.kh ORDER BY r.pt, r.shard LIMIT 1),
               (SELECT r.shard FROM ring4 r ORDER BY r.pt, r.shard LIMIT 1)) AS s_ring4,
             h.mh % 4 AS s_mod4
      FROM hashed h
    ),
    assign5 AS (
      SELECT h.key,
             COALESCE(
               (SELECT r.shard FROM ring r WHERE r.pt >= h.kh ORDER BY r.pt, r.shard LIMIT 1),
               (SELECT r.shard FROM ring r ORDER BY r.pt, r.shard LIMIT 1)) AS s_ring5,
             h.mh % 5 AS s_mod5
      FROM hashed h
    )
    SELECT COUNT(*) AS n_keys,
           ROUND(AVG(CASE WHEN a4.s_mod4 <> a5.s_mod5 THEN 1.0 ELSE 0.0 END), 6) AS mod_move_rate,
           ROUND(AVG(CASE WHEN a4.s_ring4 <> a5.s_ring5 THEN 1.0 ELSE 0.0 END), 6) AS ring_move_rate
    FROM assign4 a4 JOIN assign5 a5 ON a4.key = a5.key
"""


@register("consistent_hash_events", _CH_SQL)
def consistent_hash_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form avoids the per-key correlated subqueries of the
    oracle: the 40-point ring is a broadcast sorted array; the
    successor lookup is a scalar expression over it (filter +
    array_min), constant work per key."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.select(
        F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("event_type")).alias("key")
    ).distinct()
    hashed = keys.select(
        "key",
        F.conv(F.substring(F.md5(F.concat(F.lit("ring#"), F.col("key"))), 1, 8), 16, 10)
        .cast("long")
        .alias("kh"),
        F.conv(F.substring(F.md5(F.concat(F.lit("mod#"), F.col("key"))), 1, 4), 16, 10)
        .cast("long")
        .alias("mh"),
    )
    import hashlib

    points = sorted(
        (int(hashlib.md5(f"vn{s}_{v}".encode()).hexdigest()[:8], 16), s)
        for s in range(5)
        for v in range(_N_VNODES)
    )

    def ring_assign(kh_col, n_shards: int):
        pts = [(p, s) for p, s in points if s < n_shards]
        # successor on the sorted ring: first point >= kh, else wrap to min
        expr = F.lit(pts[0][1])  # wrap target: smallest point's shard
        for p, s in reversed(pts):
            expr = F.when(kh_col <= F.lit(p), F.lit(s)).otherwise(expr)
        return expr

    assigned = hashed.select(
        "key",
        ring_assign(F.col("kh"), 4).alias("s_ring4"),
        ring_assign(F.col("kh"), 5).alias("s_ring5"),
        F.pmod(F.col("mh"), F.lit(4)).alias("s_mod4"),
        F.pmod(F.col("mh"), F.lit(5)).alias("s_mod5"),
    )
    return assigned.agg(
        F.count("*").alias("n_keys"),
        F.round(
            F.avg(F.when(F.col("s_mod4") != F.col("s_mod5"), 1.0).otherwise(0.0)), 6
        ).alias("mod_move_rate"),
        F.round(
            F.avg(F.when(F.col("s_ring4") != F.col("s_ring5"), 1.0).otherwise(0.0)), 6
        ).alias("ring_move_rate"),
    )


_RI_SQL = """
    WITH edges AS (
      SELECT 'lineitem->orders' AS fk_edge,
             (SELECT COUNT(*) FROM lineitem) AS n_children,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'orders->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer->nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    )
    SELECT fk_edge, n_children, n_orphans,
           ROUND(1.0 - n_orphans * 1.0 / n_children, 6) AS coverage
    FROM edges
"""


@register("ri_orphans_lineitem", _RI_SQL)
def ri_orphans_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")

    def edge(name, child, key_child, parent, key_parent):
        n_children = child.count()
        orphans = child.join(
            parent.select(key_parent).distinct(),
            child[key_child] == parent[key_parent],
            "left_anti",
        ).count()
        return (name, n_children, orphans)

    rows = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
    ]
    spark = li.sparkSession
    df = spark.createDataFrame(rows, "fk_edge string, n_children long, n_orphans long")
    return df.select(
        "fk_edge",
        "n_children",
        "n_orphans",
        F.round(1.0 - F.col("n_orphans") * 1.0 / F.col("n_children"), 6).alias("coverage"),
    )
