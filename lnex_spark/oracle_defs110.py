"""Hundred-tenth oracle-registry module: mixing patterns and cohesive
edge subgraphs.

  * homophily_events — attribute homophily of the hour-bucket user
    co-occurrence graph: each user labeled with their modal event
    type (integer-count argmax, type tiebreak), edges split into
    same-label vs cross-label, and the observed same-label fraction
    compared against the label-frequency-squared expectation under
    random mixing (the assortativity-coefficient numerator).  Says
    whether "users who act alike co-occur" — the attribute-level
    sibling of degree assortativity.

  * ktruss_events — two unrolled rounds of 7-truss peeling: an edge
    survives while it participates in >= 5 triangles among surviving
    edges (support = common-neighbor count, recomputed after the
    first peel — peeling cascades, which the second round
    demonstrates on this graph: the threshold sits inside the
    support distribution, so round 1 removes edges and round 2
    removes more).  The edge-cohesion complement of k-core
    (node peeling): trusses keep only community-internal edges, the
    preprocessing step before clique-ish mining at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_EDGES_CTE = """
    ev AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hb
      FROM events WHERE user_id < 40
    ),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM ev a JOIN ev b
        ON a.event_type = b.event_type AND a.hb = b.hb AND a.user_id < b.user_id
    )
"""


_HOM_SQL = f"""
    WITH {_EDGES_CTE},
    labels AS (
      SELECT user_id, event_type AS lab FROM (
        SELECT user_id, event_type, COUNT(*) AS c,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY COUNT(*) DESC, event_type) AS rk
        FROM events WHERE user_id < 40 GROUP BY user_id, event_type
      ) WHERE rk = 1
    ),
    marked AS (
      SELECT e.u, e.v,
             CASE WHEN lu.lab = lv.lab THEN 1 ELSE 0 END AS same_lab
      FROM edges e
      JOIN labels lu ON lu.user_id = e.u
      JOIN labels lv ON lv.user_id = e.v
    ),
    lab_freq AS (
      SELECT lab, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM labels) AS f
      FROM labels GROUP BY lab
    ),
    expected AS (SELECT SUM(f * f) AS e_same FROM lab_freq)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(same_lab) AS BIGINT) AS n_same_label,
           ROUND(AVG(same_lab * 1.0), 6) AS observed_same,
           ROUND(MAX(x.e_same), 6) AS expected_same,
           ROUND(AVG(same_lab * 1.0) - MAX(x.e_same), 6) AS homophily_excess
    FROM marked CROSS JOIN expected x
"""


@register("homophily_events", _HOM_SQL)
def homophily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev0 = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    ev = ev0.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("hb")
    ).distinct()
    a = ev.select(
        F.col("user_id").alias("ua"), F.col("event_type").alias("et"), F.col("hb").alias("ha")
    )
    b = ev.select(
        F.col("user_id").alias("ub"), F.col("event_type").alias("et2"), F.col("hb").alias("hb2")
    )
    edges = (
        a.join(b, (a["et"] == b["et2"]) & (a["ha"] == b["hb2"]) & (a["ua"] < b["ub"]))
        .select(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .distinct()
    )
    wl = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
    labels = (
        ev0.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("lab"))
    )
    marked = (
        edges.join(
            labels.select(F.col("user_id").alias("u"), F.col("lab").alias("lu")), "u"
        )
        .join(labels.select(F.col("user_id").alias("v"), F.col("lab").alias("lv")), "v")
        .select(F.when(F.col("lu") == F.col("lv"), 1).otherwise(0).alias("same_lab"))
    )
    n_lab = labels.agg(F.count("*").alias("nl"))
    lab_freq = (
        labels.groupBy("lab")
        .agg(F.count("*").alias("c"))
        .crossJoin(n_lab)
        .select((F.col("c") * 1.0 / F.col("nl")).alias("f"))
    )
    expected = lab_freq.agg(F.sum(F.col("f") * F.col("f")).alias("e_same"))
    return marked.crossJoin(expected).agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("same_lab").cast("long").alias("n_same_label"),
        F.round(F.avg(F.col("same_lab") * 1.0), 6).alias("observed_same"),
        F.round(F.max("e_same"), 6).alias("expected_same"),
        F.round(F.avg(F.col("same_lab") * 1.0) - F.max("e_same"), 6).alias(
            "homophily_excess"
        ),
    )


def _truss_round(prev: str, cur: str) -> str:
    """One 7-truss peel: keep edges with >= 5 triangles among ``prev``."""
    return f"""
    und_{cur} AS (
      SELECT u, v FROM {prev} UNION ALL SELECT v, u FROM {prev}
    ),
    supp_{cur} AS (
      SELECT e.u, e.v, COUNT(*) AS sup
      FROM {prev} e
      JOIN und_{cur} x ON x.u = e.u
      JOIN und_{cur} y ON y.u = e.v AND y.v = x.v
      GROUP BY e.u, e.v
    ),
    {cur} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN supp_{cur} s ON s.u = e.u AND s.v = e.v AND s.sup >= 5
    )"""


_TRUSS_SQL = f"""
    WITH {_EDGES_CTE},
    {_truss_round("edges", "t1")},
    {_truss_round("t1", "t2")}
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges_0,
           (SELECT COUNT(*) FROM t1) AS n_edges_1,
           (SELECT COUNT(*) FROM t2) AS n_edges_2
"""


@register("ktruss_events", _TRUSS_SQL)
def ktruss_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        a.join(b, (a["et"] == b["et2"]) & (a["ha"] == b["hb2"]) & (a["ua"] < b["ub"]))
        .select(F.col("ua").alias("u"), F.col("ub").alias("v"))
        .distinct()
    )

    def peel(e: DataFrame) -> DataFrame:
        und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        x = und.select(F.col("u").alias("xu"), F.col("v").alias("xv"))
        y = und.select(F.col("u").alias("yu"), F.col("v").alias("yv"))
        supp = (
            e.join(x, e["u"] == x["xu"])
            .join(y, (e["v"] == y["yu"]) & (x["xv"] == y["yv"]))
            .groupBy("u", "v")
            .agg(F.count("*").alias("sup"))
            .filter(F.col("sup") >= 5)
            .select("u", "v")
        )
        return e.join(supp, ["u", "v"], "left_semi")

    n0 = edges.count()
    t1 = peel(edges).localCheckpoint(eager=True)
    n1 = t1.count()
    t2 = peel(t1)
    n2 = t2.count()
    return spark.createDataFrame(
        [(n0, n1, n2)], "n_edges_0 long, n_edges_1 long, n_edges_2 long"
    )
