"""Hundred-thirty-first oracle-registry module: deterministic
hash-sketch machinery — the two md5-gated primitives that complement
the existing HLL / Count-Min / Bloom / consistent-hash suite:

  * kmv_distinct_users — the K-Minimum-Values distinct sketch: hash
    every distinct user to uniform [0,1) via md5, keep the k=8
    smallest hashes, estimate D̂ = (k−1)/h_(k).  The mergeable
    order-statistics sketch HLL superseded but whose estimate is a
    pure function of the hash values — so unlike approx_count_distinct
    (rsd-toleranced), this one value-hash-matches EXACTLY across
    engines.  Emits exact count, estimate, and relative error (the
    error itself is deterministic data here).

  * rendezvous_hash_events — Highest-Random-Weight (rendezvous)
    hashing of users onto 8 nodes (assigned node = argmax
    md5(node#user)), then node n3 removed: per node, the count
    before, the count after, and how many keys MOVED OUT — exactly
    the n3 rows move and every other node's assignment is untouched,
    the minimal-disruption property measured as data (the shard-
    assignment alternative to consistent_hash_events' ring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_KMV_SQL = """
    WITH hu AS (
      SELECT DISTINCT user_id,
             CAST(CAST(('0x' || substr(md5('u' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 AS h
      FROM events
    ),
    topk AS (SELECT h FROM hu ORDER BY h LIMIT 8),
    st AS (SELECT MAX(h) AS hk, COUNT(*) AS k FROM topk),
    ex AS (SELECT COUNT(*) AS exact FROM hu)
    SELECT CAST(ex.exact AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN st.k < 8 THEN ex.exact
                      ELSE (st.k - 1) / st.hk END, 6) AS kmv_estimate,
           ROUND(abs(CASE WHEN st.k < 8 THEN ex.exact
                          ELSE (st.k - 1) / st.hk END - ex.exact)
                 / ex.exact, 6) AS rel_err
    FROM ex CROSS JOIN st
"""


@register("kmv_distinct_users", _KMV_SQL)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    hu = e.select("user_id").distinct().select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("u"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / 4294967296.0
        ).alias("h")
    )
    st = hu.orderBy("h").limit(8).agg(
        F.max("h").alias("hk"), F.count("*").alias("k")
    )
    ex = hu.agg(F.count("*").alias("exact"))
    est = F.when(F.col("k") < 8, F.col("exact")).otherwise(
        (F.col("k") - 1) / F.col("hk")
    )
    return ex.crossJoin(F.broadcast(st)).select(
        F.col("exact").cast("long").alias("exact_distinct"),
        F.round(est, 6).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("exact")) / F.col("exact"), 6).alias(
            "rel_err"
        ),
    )


_NODES = [f"n{i}" for i in range(8)]
_NODES_SQL = "', '".join(_NODES)

_HRW_SQL = f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    nodes AS (SELECT unnest(['{_NODES_SQL}']) AS node),
    w AS (
      SELECT u.user_id, n.node,
             CAST(('0x' || substr(md5(n.node || '#' || CAST(u.user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS wt
      FROM users u CROSS JOIN nodes n
    ),
    bef AS (
      SELECT user_id, node FROM (
        SELECT user_id, node,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY wt DESC, node) AS rk
        FROM w) WHERE rk = 1
    ),
    aft AS (
      SELECT user_id, node FROM (
        SELECT user_id, node,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY wt DESC, node) AS rk
        FROM w WHERE node != 'n3') WHERE rk = 1
    ),
    per_bef AS (
      SELECT b.node,
             COUNT(*) AS cnt_before,
             SUM(CASE WHEN a.node != b.node THEN 1 ELSE 0 END) AS moved_out
      FROM bef b JOIN aft a USING (user_id) GROUP BY b.node
    ),
    per_aft AS (SELECT node, COUNT(*) AS cnt_after FROM aft GROUP BY node)
    SELECT p.node,
           CAST(p.cnt_before AS BIGINT) AS cnt_before,
           CAST(COALESCE(a.cnt_after, 0) AS BIGINT) AS cnt_after,
           CAST(p.moved_out AS BIGINT) AS moved_out
    FROM per_bef p LEFT JOIN per_aft a USING (node)
"""


@register("rendezvous_hash_events", _HRW_SQL)
def rendezvous_hash_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    nodes = users.sparkSession.createDataFrame(
        [(n,) for n in _NODES], ["node"]
    )
    w = users.crossJoin(F.broadcast(nodes)).select(
        "user_id",
        "node",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("node"),
                        F.lit("#"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("wt"),
    )

    def argmax(df: DataFrame) -> DataFrame:
        win = Window.partitionBy("user_id").orderBy(
            F.desc("wt"), F.asc("node")
        )
        return (
            df.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") == 1)
            .select("user_id", "node")
        )

    bef = argmax(w)
    aft = argmax(w.filter(F.col("node") != "n3"))
    per_bef = (
        bef.withColumnRenamed("node", "node_b")
        .join(aft.withColumnRenamed("node", "node_a"), "user_id")
        .groupBy(F.col("node_b").alias("node"))
        .agg(
            F.count("*").cast("long").alias("cnt_before"),
            F.sum(
                F.when(F.col("node_a") != F.col("node_b"), 1).otherwise(0)
            )
            .cast("long")
            .alias("moved_out"),
        )
    )
    per_aft = aft.groupBy("node").agg(
        F.count("*").cast("long").alias("cnt_after")
    )
    return per_bef.join(F.broadcast(per_aft), "node", "left").select(
        "node",
        "cnt_before",
        F.coalesce("cnt_after", F.lit(0)).cast("long").alias("cnt_after"),
        "moved_out",
    )
