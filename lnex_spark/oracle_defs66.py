"""Sixty-sixth oracle-registry module: directed link analysis and
fairness auditing.

  * hits_events — HITS hubs & authorities, 3 unrolled rounds with
    per-round L2 normalization and rounding (the k-means/power-
    iteration determinism discipline), over the directed bipartite
    (user → event_type) engagement graph with edge weight = event
    count.  Complements PageRank (undirected co-mention) with the
    directed centrality pair; each round is two weighted-join
    aggregates, shuffle bounded by the edge list.

  * fairness_audit_docs — the group-fairness audit of the
    "lang='en' iff n_chars > 320" classifier across source-prefix
    groups: per group the positive-prediction rate (demographic
    parity), TPR and FPR (equalized odds), plus each group's gap to
    the overall rate.  The release gate a model card quotes; one
    contingency aggregate, gaps via a broadcast of the one-row
    overall margins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# hits_events
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 3


def _hits_sql() -> str:
    blocks = [
        """edges AS (
      SELECT CAST(user_id AS VARCHAR) AS hub, event_type AS auth, COUNT(*) AS w
      FROM events GROUP BY user_id, event_type
    ),
    h0 AS (SELECT DISTINCT hub, 1.0 AS hs FROM edges)"""
    ]
    for r in range(1, _HITS_ROUNDS + 1):
        p = r - 1
        blocks.append(
            f"""ar{r} AS (
      SELECT e.auth, SUM(e.w * h.hs) AS s
      FROM edges e JOIN h{p} h ON e.hub = h.hub GROUP BY e.auth
    ),
    an{r} AS (SELECT sqrt(SUM(s * s)) AS nrm FROM ar{r}),
    a{r} AS (SELECT auth, round(s / (SELECT nrm FROM an{r}), 6) AS ascore FROM ar{r}),
    hr{r} AS (
      SELECT e.hub, SUM(e.w * a.ascore) AS s
      FROM edges e JOIN a{r} a ON e.auth = a.auth GROUP BY e.hub
    ),
    hn{r} AS (SELECT sqrt(SUM(s * s)) AS nrm FROM hr{r}),
    h{r} AS (SELECT hub, round(s / (SELECT nrm FROM hn{r}), 6) AS hs FROM hr{r})"""
        )
    last = _HITS_ROUNDS
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"""
    SELECT 'auth:' || auth AS node, ascore AS score FROM a{last}
    UNION ALL
    SELECT 'hub:' || hub, hs FROM h{last}
    """
    )


@register("hits_events", _hits_sql())
def hits_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    edges = ev.groupBy(
        F.col("user_id").cast("string").alias("hub"), F.col("event_type").alias("auth")
    ).agg(F.count("*").alias("w"))
    h = edges.select("hub").distinct().select("hub", F.lit(1.0).alias("hs"))
    a = None
    for _ in range(_HITS_ROUNDS):
        ar = (
            edges.join(h, "hub")
            .groupBy("auth")
            .agg(F.sum(F.col("w") * F.col("hs")).alias("s"))
        )
        an = ar.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
        a = ar.crossJoin(an).select("auth", F.round(F.col("s") / F.col("nrm"), 6).alias("ascore"))
        hr = (
            edges.join(a, "auth")
            .groupBy("hub")
            .agg(F.sum(F.col("w") * F.col("ascore")).alias("s"))
        )
        hn = hr.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
        h = hr.crossJoin(hn).select("hub", F.round(F.col("s") / F.col("nrm"), 6).alias("hs"))
    return a.select(
        F.concat(F.lit("auth:"), F.col("auth")).alias("node"), F.col("ascore").alias("score")
    ).unionByName(
        h.select(F.concat(F.lit("hub:"), F.col("hub")).alias("node"), F.col("hs").alias("score"))
    )


# ---------------------------------------------------------------------------
# fairness_audit_docs
# ---------------------------------------------------------------------------

_FAIR_SQL = """
    WITH scored AS (
      SELECT substr(source, 1, 4) AS grp,
             CAST(n_chars > 320 AS INTEGER) AS pred,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    per_grp AS (
      SELECT grp,
             COUNT(*) AS n,
             AVG(CAST(pred AS DOUBLE)) AS ppr,
             SUM(pred * y) * 1.0 / NULLIF(SUM(y), 0) AS tpr,
             SUM(pred * (1 - y)) * 1.0 / NULLIF(SUM(1 - y), 0) AS fpr
      FROM scored GROUP BY grp
    ),
    overall AS (
      SELECT AVG(CAST(pred AS DOUBLE)) AS o_ppr,
             SUM(pred * y) * 1.0 / NULLIF(SUM(y), 0) AS o_tpr,
             SUM(pred * (1 - y)) * 1.0 / NULLIF(SUM(1 - y), 0) AS o_fpr
      FROM scored
    )
    SELECT grp, n,
           ROUND(ppr, 6) AS ppr,
           ROUND(tpr, 6) AS tpr,
           ROUND(fpr, 6) AS fpr,
           ROUND(ppr - o_ppr, 6) AS parity_gap,
           ROUND(tpr - o_tpr, 6) AS tpr_gap,
           ROUND(fpr - o_fpr, 6) AS fpr_gap
    FROM per_grp, overall
"""


@register("fairness_audit_docs", _FAIR_SQL)
def fairness_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        F.substring("source", 1, 4).alias("grp"),
        (F.col("n_chars") > 320).cast("int").alias("pred"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    def rates(df, prefix=""):
        return [
            F.avg(F.col("pred").cast("double")).alias(prefix + "ppr"),
            (
                F.sum(F.col("pred") * F.col("y")) * 1.0
                / F.nullif(F.sum("y"), F.lit(0))
            ).alias(prefix + "tpr"),
            (
                F.sum(F.col("pred") * (1 - F.col("y"))) * 1.0
                / F.nullif(F.sum(1 - F.col("y")), F.lit(0))
            ).alias(prefix + "fpr"),
        ]

    per_grp = scored.groupBy("grp").agg(F.count("*").alias("n"), *rates(scored))
    overall = scored.agg(*rates(scored, "o_"))
    return per_grp.crossJoin(overall).select(
        "grp",
        "n",
        F.round("ppr", 6).alias("ppr"),
        F.round("tpr", 6).alias("tpr"),
        F.round("fpr", 6).alias("fpr"),
        F.round(F.col("ppr") - F.col("o_ppr"), 6).alias("parity_gap"),
        F.round(F.col("tpr") - F.col("o_tpr"), 6).alias("tpr_gap"),
        F.round(F.col("fpr") - F.col("o_fpr"), 6).alias("fpr_gap"),
    )
