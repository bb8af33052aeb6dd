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
