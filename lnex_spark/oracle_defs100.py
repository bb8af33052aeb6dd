"""Hundredth oracle-registry module: denormalization storage planning
and graph transitivity.

  * denorm_cost_star — the storage-cost readout behind the
    denormalize-or-join decision: exact byte accounting (8 bytes per
    numeric/timestamp, octet_length per string) for the three star
    tables orders/customer/nation vs the single wide table their
    join would materialize — total bytes both ways and the
    amplification factor.  Denormalizing trades this write/storage
    amplification for zero join cost at read time; the number a
    warehouse layout review wants on the table.

  * clustering_coeff_events — the global clustering coefficient
    C = 3·triangles / wedges of the hour-bucket user co-occurrence
    graph: triangles from the oriented 3-join (the tri_count_events
    shape), wedges = Σ d(d−1)/2 from the degree table.  C says
    whether co-occurrence is community-like (triadic closure) or
    star-like (hubs) — the one-number structure summary that decides
    if community detection is even worth running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DENORM_SQL = """
    WITH o AS (
      SELECT SUM(8 + 8 + strlen(o_orderstatus) + 8 + 8
                 + strlen(o_orderpriority)) AS bytes,
             COUNT(*) AS n
      FROM orders
    ),
    c AS (
      SELECT c_custkey,
             8 + strlen(c_name) + 8 + 8 + strlen(c_mktsegment) AS row_bytes
      FROM customer
    ),
    n AS (
      SELECT n_nationkey,
             8 + strlen(n_name) + 8 AS row_bytes
      FROM nation
    ),
    c_tot AS (SELECT SUM(row_bytes) AS bytes, COUNT(*) AS n FROM c),
    n_tot AS (SELECT SUM(row_bytes) AS bytes, COUNT(*) AS n FROM n),
    wide AS (
      SELECT SUM(8 + 8 + strlen(o.o_orderstatus) + 8 + 8
                 + strlen(o.o_orderpriority)
                 + cc.row_bytes + nn.row_bytes) AS bytes,
             COUNT(*) AS n
      FROM orders o
      JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN c cc ON cc.c_custkey = cu.c_custkey
      JOIN nation na ON cu.c_nationkey = na.n_nationkey
      JOIN n nn ON nn.n_nationkey = na.n_nationkey
    )
    SELECT CAST(o.bytes + c_tot.bytes + n_tot.bytes AS BIGINT) AS star_bytes,
           CAST(wide.bytes AS BIGINT) AS denorm_bytes,
           CAST(wide.n AS BIGINT) AS n_wide_rows,
           ROUND(wide.bytes * 1.0 / (o.bytes + c_tot.bytes + n_tot.bytes), 6)
             AS amplification
    FROM o, c_tot, n_tot, wide
"""


@register("denorm_cost_star", _DENORM_SQL)
def denorm_cost_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    o_row = (
        F.lit(8 + 8 + 8 + 8)
        + F.octet_length("o_orderstatus")
        + F.octet_length("o_orderpriority")
    )
    c_row = (
        F.lit(8 + 8 + 8)
        + F.octet_length("c_name")
        + F.octet_length("c_mktsegment")
    )
    n_row = F.lit(8 + 8) + F.octet_length("n_name")
    o_tot = o.agg(F.sum(o_row).alias("o_bytes"))
    c_tot = cu.agg(F.sum(c_row).alias("c_bytes"))
    n_tot = na.agg(F.sum(n_row).alias("n_bytes"))
    wide = (
        o.join(cu, o["o_custkey"] == cu["c_custkey"])
        .join(na, cu["c_nationkey"] == na["n_nationkey"])
        .agg(
            F.sum(o_row + c_row + n_row).alias("w_bytes"),
            F.count("*").alias("n_wide"),
        )
    )
    return (
        o_tot.crossJoin(c_tot)
        .crossJoin(n_tot)
        .crossJoin(wide)
        .select(
            (F.col("o_bytes") + F.col("c_bytes") + F.col("n_bytes"))
            .cast("long")
            .alias("star_bytes"),
            F.col("w_bytes").cast("long").alias("denorm_bytes"),
            F.col("n_wide").cast("long").alias("n_wide_rows"),
            F.round(
                F.col("w_bytes")
                * 1.0
                / (F.col("o_bytes") + F.col("c_bytes") + F.col("n_bytes")),
                6,
            ).alias("amplification"),
        )
    )


_CC_SQL = """
    WITH ev AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hb
      FROM events WHERE user_id < 40
    ),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM ev a JOIN ev b
        ON a.event_type = b.event_type AND a.hb = b.hb AND a.user_id < b.user_id
    ),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
    tri AS (
      SELECT COUNT(*) AS t
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wedge AS (SELECT SUM(d * (d - 1) / 2) AS w FROM deg)
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           CAST(wedge.w AS BIGINT) AS n_wedges,
           ROUND(3.0 * tri.t / NULLIF(wedge.w, 0), 6) AS clustering_coeff
    FROM tri, wedge
"""


@register("clustering_coeff_events", _CC_SQL)
def clustering_coeff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hb"))
        .distinct()
    )
    a = ev.select(
        F.col("user_id").alias("ua"), F.col("event_type").alias("et"), F.col("hb").alias("ha")
    )
    b = ev.select(
        F.col("user_id").alias("ub"), F.col("event_type").alias("et2"), F.col("hb").alias("hb2")
    )
    edges = (
        a.join(
            b,
            (a["et"] == b["et2"]) & (a["ha"] == b["hb2"]) & (a["ua"] < b["ub"]),
        )
        .select(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .distinct()
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y2"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x3"), F.col("v").alias("z3"))
    tri = (
        e1.join(e2, e1["y"] == e2["y2"])
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .agg(F.count("*").alias("t"))
    )
    wedge = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w"))
    n_edges = edges.agg(F.count("*").alias("ne"))
    return (
        tri.crossJoin(wedge)
        .crossJoin(n_edges)
        .select(
            F.col("ne").cast("long").alias("n_edges"),
            F.col("t").cast("long").alias("n_triangles"),
            F.col("w").cast("long").alias("n_wedges"),
            F.round(
                3.0 * F.col("t") / F.nullif(F.col("w").cast("double"), F.lit(0.0)), 6
            ).alias("clustering_coeff"),
        )
    )
