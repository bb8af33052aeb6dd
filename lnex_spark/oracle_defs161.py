"""Hundred-sixty-first oracle-registry module: spectral node
importance on the event-type transition graph — the two classical
centralities the graph suite (pagerank / HITS / k-core / LPA) still
lacked.  Both follow the registry's lockstep-iteration discipline:
a FIXED number of unrolled rounds with round-6 normalization after
each, so Spark and DuckDB walk bit-identical trajectories.

  * eigenvector_centrality_events — power iteration (4 rounds, from
    uniform, L2-normalized and ROUNDED to 6 per round) of x ← P'x on
    the row-stochastic type→type transition graph (consecutive
    events per user in (ts, event_id) order, weights = transition
    probabilities).  The "importance flows
    from important predecessors" score; the principal-eigenvector
    sibling of kg_pagerank without teleportation.

  * katz_centrality_events — Katz centrality via 4 unrolled rounds
    of x ← alpha A' x + 1 (alpha = 0.5 on the row-stochastic
    transition matrix, so alpha < 1/lambda_max = 1 and the series
    contracts; per-round round-6).  Unlike eigenvector
    centrality it gives every node a baseline of 1, so nodes with no
    in-edges still rank — the variant used for sparse mention graphs
    where pure eigenvector mass collapses onto one component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ROUNDS = 4
_ALPHA = 0.5

_EDGES_SQL = """edges AS (
      SELECT src, dst, COUNT(*) AS w FROM (
        SELECT event_type AS dst,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS src
        FROM events
      ) WHERE src IS NOT NULL
      GROUP BY src, dst
    ),
    outd AS (SELECT src, SUM(w) AS d FROM edges GROUP BY src),
    pedges AS (
      SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.d AS w
      FROM edges e JOIN outd o ON o.src = e.src
    ),
    nodes AS (
      SELECT DISTINCT n FROM (
        SELECT src AS n FROM edges UNION SELECT dst FROM edges
      )
    )"""


def _eig_sql() -> str:
    blocks = [
        _EDGES_SQL,
        """xn0 AS (SELECT COUNT(*) AS c FROM nodes),
    x0 AS (SELECT n, ROUND(1.0 / SQRT((SELECT c FROM xn0)), 6) AS x
           FROM nodes)""",
    ]
    for r in range(1, _ROUNDS + 1):
        p = r - 1
        blocks.append(
            f"""r{r} AS (
      SELECT nd.n, COALESCE(SUM(e.w * x.x), 0) AS s
      FROM nodes nd
      LEFT JOIN pedges e ON e.dst = nd.n
      LEFT JOIN x{p} x ON x.n = e.src
      GROUP BY nd.n
    ),
    n{r} AS (SELECT SQRT(SUM(s * s)) AS nrm FROM r{r}),
    x{r} AS (SELECT n, ROUND(s / (SELECT nrm FROM n{r}), 6) AS x
             FROM r{r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"\n    SELECT n AS node, x AS score FROM x{_ROUNDS} ORDER BY node"
    )


@register("eigenvector_centrality_events", _eig_sql())
def eigenvector_centrality_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outd = edges.groupBy("src").agg(F.sum("w").alias("d"))
    edges = edges.join(outd, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("d")).alias("w")
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    c = nodes.count()
    x = nodes.select(
        "n", F.round(F.lit(1.0 / (c ** 0.5)), 6).alias("x")
    )
    for _ in range(_ROUNDS):
        r = (
            nodes.join(edges, edges.dst == nodes.n, "left")
            .join(
                x.select(F.col("n").alias("sn"), F.col("x").alias("xs")),
                F.col("src") == F.col("sn"),
                "left",
            )
            .groupBy(nodes.n)
            .agg(F.coalesce(F.sum(F.col("w") * F.col("xs")), F.lit(0.0)).alias("s"))
        )
        nrm = r.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
        x = r.crossJoin(F.broadcast(nrm)).select(
            "n", F.round(F.col("s") / F.col("nrm"), 6).alias("x")
        )
    return x.select(F.col("n").alias("node"), F.col("x").alias("score")).orderBy(
        "node"
    )


def _katz_sql() -> str:
    blocks = [
        _EDGES_SQL,
        "x0 AS (SELECT n, 1.0 AS x FROM nodes)",
    ]
    for r in range(1, _ROUNDS + 1):
        p = r - 1
        blocks.append(
            f"""x{r} AS (
      SELECT nd.n,
             ROUND(CAST({_ALPHA!r} AS DOUBLE) * COALESCE(SUM(e.w * x.x), 0) + 1, 6) AS x
      FROM nodes nd
      LEFT JOIN pedges e ON e.dst = nd.n
      LEFT JOIN x{p} x ON x.n = e.src
      GROUP BY nd.n
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"\n    SELECT n AS node, x AS katz FROM x{_ROUNDS} ORDER BY node"
    )


@register("katz_centrality_events", _katz_sql())
def katz_centrality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outd = edges.groupBy("src").agg(F.sum("w").alias("d"))
    edges = edges.join(outd, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("d")).alias("w")
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    x = nodes.select("n", F.lit(1.0).alias("x"))
    for _ in range(_ROUNDS):
        x = (
            nodes.join(edges, edges.dst == nodes.n, "left")
            .join(
                x.select(F.col("n").alias("sn"), F.col("x").alias("xs")),
                F.col("src") == F.col("sn"),
                "left",
            )
            .groupBy(nodes.n)
            .agg(
                F.round(
                    _ALPHA
                    * F.coalesce(F.sum(F.col("w") * F.col("xs")), F.lit(0.0))
                    + 1,
                    6,
                ).alias("x")
            )
        )
    return x.select(F.col("n").alias("node"), F.col("x").alias("katz")).orderBy(
        "node"
    )
