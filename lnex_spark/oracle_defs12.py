"""Twelfth oracle-registry module: embedding-column analytics —
per-label centroids (positional unnest + two-key agg, the reduce
behind k-means/IVF training) and L2 norms via higher-order array
aggregation (the normalize step ahead of cosine similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- per-label centroid, componentwise ----------------------------------
@register(
    "label_centroids",
    """
    SELECT label, i AS pos, round(avg(v), 6) AS mean_v
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    GROUP BY label, i
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Componentwise label centroids: posexplode → (label, pos) hash
    agg. At 100 TB this is the canonical map-side-combining reduce —
    shuffle volume is labels x dims, independent of row count."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("p", "v"))
        .groupBy("label", (F.col("p") + 1).alias("pos"))
        .agg(F.round(F.avg("v"), 6).alias("mean_v"))
    )


# --- L2 norms via higher-order aggregate --------------------------------
@register(
    "vector_norms",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding, x -> x * x))), 6) AS l2_norm
    FROM embeddings WHERE vec_id < 300
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select("vec_id", F.round(F.sqrt(sq_sum), 6).alias("l2_norm"))


# --- stratified deterministic sampling ----------------------------------
@register(
    "stratified_sample_docs",
    """
    WITH gated AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('strat-v1#' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
      FROM documents
    )
    SELECT doc_id, lang FROM gated
    WHERE bucket < CASE lang WHEN 'en' THEN 32768 WHEN 'de' THEN 13107 ELSE 6554 END
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (en 50%, de 20%, rest 10%):
    the language-rebalancing subset step of corpus assembly, as md5
    gating so the sample is reproducible across engines and reruns —
    ``df.sampleBy`` is engine-private RNG and is not."""
    from lnex_spark.operators.curation import hash_bucket

    d = _t(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "strat-v1")
    rate = (
        F.when(F.col("lang") == "en", 32768)
        .when(F.col("lang") == "de", 13107)
        .otherwise(6554)
    )
    return d.filter(bucket < rate).select("doc_id", "lang")


def _lpa_round(prev: str, cur: str) -> str:
    """One unrolled synchronous-LPA round as DuckDB CTEs."""
    return f"""
    cnt_{cur} AS (
      SELECT und.b AS node, {prev}.label, count(*) AS c
      FROM und JOIN {prev} ON und.a = {prev}.node
      GROUP BY und.b, {prev}.label
    ),
    {cur} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rk
        FROM cnt_{cur}
      ) WHERE rk = 1
    )"""


_LPA_SQL = (
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
    und AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),"""
    + ",".join(_lpa_round(f"l{i}", f"l{i + 1}") for i in range(3))
    + """
    SELECT node, label FROM l3
    """
)


# --- label-propagation communities (unrolled-iteration oracle) ----------
@register("lpa_communities_events", _LPA_SQL)
def lpa_communities_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous LPA over the hour-bucket co-occurrence graph
    (same edge construction as tri_count_events) — the Spark side is
    the genuinely iterative operators/graph.label_propagation job, the
    DuckDB side an independent fully-unrolled re-derivation."""
    from lnex_spark.operators.graph import label_propagation

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hb"))
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("doc_a"), F.col("b.user_id").alias("doc_b"))
        .distinct()
    )
    return label_propagation(edges, iterations=3)
