"""Eighty-second oracle-registry module: directed-graph condensation
and submodular corpus selection.

  * scc_transitions_events — strongly connected components of the
    directed event-type transition graph (edges = consecutive
    distinct types per user in time order).  Reachability closure by
    REPEATED SQUARING — R ∪ R∘R three times covers all paths up to
    length 8 with ceil(log2(d)) joins instead of d relaxation
    rounds, the iteration-count trick that matters when the graph
    diameter is large and every round is a shuffle; SCC = mutual
    reachability (R ∩ Rᵀ), component id = min member, all unrolled
    identically on both engines.  Completes the graph suite's
    directed-graph half (components/LPA/k-core are undirected).

  * greedy_cover_docs — three unrolled rounds of the greedy
    max-coverage pick: each round selects the document covering the
    most not-yet-covered word BIGRAMS (ties to the smaller doc_id),
    then folds its bigrams into the covered set.  Bigrams, not
    unigrams, because the synthetic corpus has a closed 31-type
    unigram vocabulary a single document nearly covers.  The
    (1-1/e) greedy heuristic behind coverage-maximizing corpus
    subset selection; per round one anti-join + one hash aggregate
    + a driver-side single-row argmax (the same bounded-driver
    pattern as kcenter_embeddings' farthest-point picks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SCC_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    edges AS (
      SELECT DISTINCT event_type AS a, next_type AS b
      FROM ordered WHERE next_type IS NOT NULL AND next_type <> event_type
    ),
    nodes AS (
      SELECT a AS node FROM edges UNION SELECT b FROM edges
    ),
    r0 AS (
      SELECT a, b FROM edges UNION SELECT node, node FROM nodes
    ),
    r1 AS (
      SELECT a, b FROM r0
      UNION SELECT x.a, y.b FROM r0 x JOIN r0 y ON x.b = y.a
    ),
    r2 AS (
      SELECT a, b FROM r1
      UNION SELECT x.a, y.b FROM r1 x JOIN r1 y ON x.b = y.a
    ),
    r3 AS (
      SELECT a, b FROM r2
      UNION SELECT x.a, y.b FROM r2 x JOIN r2 y ON x.b = y.a
    ),
    mutual AS (
      SELECT f.a AS node, f.b AS peer
      FROM r3 f JOIN r3 r ON f.a = r.b AND f.b = r.a
    ),
    scc AS (
      SELECT node, MIN(peer) AS scc_id FROM mutual GROUP BY node
    )
    SELECT s.node, s.scc_id, CAST(c.sz AS BIGINT) AS scc_size
    FROM scc s
    JOIN (SELECT scc_id, COUNT(*) AS sz FROM scc GROUP BY scc_id) c
      ON s.scc_id = c.scc_id
"""


@register("scc_transitions_events", _SCC_SQL)
def scc_transitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    edges = (
        ordered.filter(
            F.col("next_type").isNotNull() & (F.col("next_type") != F.col("event_type"))
        )
        .select(F.col("event_type").alias("a"), F.col("next_type").alias("b"))
        .distinct()
    )
    nodes = edges.select(F.col("a").alias("node")).union(
        edges.select(F.col("b").alias("node"))
    ).distinct()
    r = edges.union(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b"))
    ).distinct()
    for _ in range(3):
        x = r.select(F.col("a").alias("xa"), F.col("b").alias("xb"))
        y = r.select(F.col("a").alias("ya"), F.col("b").alias("yb"))
        step = x.join(y, x["xb"] == y["ya"]).select(
            F.col("xa").alias("a"), F.col("yb").alias("b")
        )
        r = r.union(step).distinct()
    fwd = r.select(F.col("a").alias("node"), F.col("b").alias("peer"))
    rev = r.select(F.col("b").alias("rnode"), F.col("a").alias("rpeer"))
    mutual = fwd.join(
        rev, (fwd["node"] == rev["rnode"]) & (fwd["peer"] == rev["rpeer"])
    ).select("node", "peer")
    scc = mutual.groupBy("node").agg(F.min("peer").alias("scc_id"))
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("sz"))
    return scc.join(sizes, "scc_id").select(
        "node", "scc_id", F.col("sz").cast("long").alias("scc_size")
    )


_COVER_ROUNDS = 3

_COVER_SQL = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id < 300
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
    ),
    dtx AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS tok FROM pos),
    universe AS (SELECT COUNT(DISTINCT tok) AS n_univ FROM dtx),
    g1 AS (
      SELECT doc_id, COUNT(*) AS gain FROM dtx GROUP BY doc_id
      ORDER BY gain DESC, doc_id LIMIT 1
    ),
    cov1 AS (SELECT DISTINCT tok FROM dtx WHERE doc_id = (SELECT doc_id FROM g1)),
    g2 AS (
      SELECT d.doc_id, COUNT(*) AS gain FROM dtx d
      WHERE d.tok NOT IN (SELECT tok FROM cov1)
      GROUP BY d.doc_id ORDER BY gain DESC, doc_id LIMIT 1
    ),
    cov2 AS (
      SELECT tok FROM cov1
      UNION SELECT tok FROM dtx WHERE doc_id = (SELECT doc_id FROM g2)
    ),
    g3 AS (
      SELECT d.doc_id, COUNT(*) AS gain FROM dtx d
      WHERE d.tok NOT IN (SELECT tok FROM cov2)
      GROUP BY d.doc_id ORDER BY gain DESC, doc_id LIMIT 1
    ),
    cov3 AS (
      SELECT tok FROM cov2
      UNION SELECT tok FROM dtx WHERE doc_id = (SELECT doc_id FROM g3)
    ),
    picks AS (
      SELECT 1 AS rnd, doc_id, gain, (SELECT COUNT(*) FROM cov1) AS covered FROM g1
      UNION ALL
      SELECT 2, doc_id, gain, (SELECT COUNT(*) FROM cov2) FROM g2
      UNION ALL
      SELECT 3, doc_id, gain, (SELECT COUNT(*) FROM cov3) FROM g3
    )
    SELECT rnd, doc_id, CAST(gain AS BIGINT) AS gain,
           CAST(covered AS BIGINT) AS covered_after,
           ROUND(covered * 1.0 / (SELECT n_univ FROM universe), 6) AS coverage_frac
    FROM picks
"""


@register("greedy_cover_docs", _COVER_SQL)
def greedy_cover_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    dtx = (
        toks.select(
            "doc_id", F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
        )
        .select("doc_id", F.array_join(F.slice("t", F.col("i"), 2), " ").alias("tok"))
        .distinct()
        .cache()
    )
    n_univ = dtx.select("tok").distinct().count()
    remaining = dtx
    covered = None  # DataFrame of covered toks
    rows = []
    n_covered = 0
    for rnd in range(1, _COVER_ROUNDS + 1):
        pick = (
            remaining.groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()[0]
        )
        picked_toks = dtx.filter(F.col("doc_id") == pick["doc_id"]).select("tok")
        covered = picked_toks if covered is None else covered.union(picked_toks).distinct()
        n_covered = covered.count()
        rows.append((rnd, pick["doc_id"], pick["gain"], n_covered))
        remaining = remaining.join(covered, "tok", "left_anti")
    dtx.unpersist()
    out = spark.createDataFrame(
        rows, "rnd int, doc_id long, gain long, covered_after long"
    )
    return out.select(
        "rnd",
        "doc_id",
        "gain",
        "covered_after",
        F.round(F.col("covered_after") * 1.0 / F.lit(n_univ), 6).alias("coverage_frac"),
    )
