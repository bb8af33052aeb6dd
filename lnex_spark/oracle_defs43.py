"""Forty-third oracle-registry module: min-plus path relaxation and
stable log-sum-exp.

  * wsp_landmark_events — weighted shortest-path distances from the
    landmark set in ≤3 relaxation rounds (Bellman-Ford over the
    co-occurrence graph with deterministic integer edge weights
    (u+v) mod 7 + 1): the MIN-PLUS (tropical) semiring sibling of
    bfs_landmarks (boolean) and matmul (sum-product) — the three
    semirings distributed graph/linear algebra actually runs on,
    each with an unrolled oracle.
  * logsumexp_events — numerically-stable log-sum-exp of value/10
    per event type (max-shift form LSE = m + ln Σ exp(x−m)): the
    softmax-normalizer primitive behind every classifier head and
    attention score aggregation, written identically on both engines
    so the max-shift — not engine luck — carries the stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- weighted shortest paths (3 Bellman-Ford rounds) -----------------------
def _wsp_round(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT und.b AS node, {prev}.dist + und.w AS dist
        FROM und JOIN {prev} ON und.a = {prev}.node
      ) GROUP BY node
    )"""


_WSP_SQL = (
    """
    WITH ev AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hb
      FROM events WHERE user_id < 40
    ),
    e0 AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM ev a JOIN ev b
        ON a.event_type = b.event_type AND a.hb = b.hb AND a.user_id < b.user_id
    ),
    und AS (
      SELECT u AS a, v AS b, (u + v) % 7 + 1 AS w FROM e0
      UNION SELECT v, u, (u + v) % 7 + 1 FROM e0
    ),
    d0 AS (
      SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS dist
      FROM und WHERE a % 10 = 0
    ),"""
    + ",".join(_wsp_round(f"d{i}", f"d{i + 1}") for i in range(3))
    + """
    SELECT node, dist FROM d3
    """
)


@register("wsp_landmark_events", _WSP_SQL)
def wsp_landmark_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Bellman-Ford relaxations from node%10==0 landmarks with
    w(u,v) = (u+v)%7+1 — same per-round shuffle shape as
    bfs_distances (edge⋈dist join + min agg) on the min-plus
    semiring; fixed rounds keep it a deterministic function an
    unrolled oracle replays exactly."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hb"))
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    wexpr = (F.col("u") + F.col("v")) % 7 + 1
    und = (
        e0.select(F.col("u").alias("a"), F.col("v").alias("b"), wexpr.alias("w"))
        .unionByName(
            e0.select(F.col("v").alias("a"), F.col("u").alias("b"), wexpr.alias("w"))
        )
        .distinct()
    )
    n_part = und.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    und = und.repartition(int(n_part), "a").persist()
    dist = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .filter(F.col("node") % 10 == 0)
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(3):
        prop = und.join(dist, und["a"] == dist["node"]).select(
            F.col("b").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(prop)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return dist


# --- stable log-sum-exp per event type -------------------------------------
_LSE_SQL = """
    WITH s AS (SELECT event_type, value / 10.0 AS x FROM events),
    m AS (SELECT event_type, max(x) AS mx FROM s GROUP BY event_type)
    SELECT s.event_type, count(*) AS n,
           round(m.mx + ln(sum(exp(s.x - m.mx))), 6) AS logsumexp
    FROM s JOIN m ON s.event_type = m.event_type
    GROUP BY s.event_type, m.mx
"""


@register("logsumexp_events", _LSE_SQL)
def logsumexp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("value") / 10.0).alias("x")
    )
    m = s.groupBy("event_type").agg(F.max("x").alias("mx"))
    return (
        s.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "mx")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.col("mx") + F.log(F.sum(F.exp(F.col("x") - F.col("mx")))), 6
            ).alias("logsumexp"),
        )
        .select("event_type", "n", "logsumexp")
    )
