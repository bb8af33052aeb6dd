"""Ninth oracle-registry module: KG quality reporting + spatial
binning.

  * kg_ambiguity_report — the disambiguation QA view a KG pipeline
    ships alongside its triples: per mentioned surface form, how many
    candidate entities the gazetteer offers, how often it was
    mentioned, which entity won the canonical vote, and the vote
    margin (winner votes − runner-up votes; margin 0 means the tie
    was broken by the deterministic geo_id order).  Built on the SAME
    literal gazetteer + relational matcher derivation as kg_e2e_sql,
    so the report is value-checked against an independent DuckDB
    re-derivation of the whole pipeline.
  * geo_grid_cells — fixed-grid spatial binning (floor-divide lat/lon
    into 5° cells, count + centroid per cell): the partition-key
    construction for gazetteer sharding at planet scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs2 import (
    _SQL_LINK,
    _SQL_TOKENIZE,
    _oracle_mentions,
    _oracle_variants,
)
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- disambiguation QA report -------------------------------------------
@register(
    "kg_ambiguity_report",
    f"""
    WITH {_SQL_TOKENIZE},
    {_SQL_LINK},
    cands AS (SELECT norm, count(DISTINCT geo_id) AS n_candidates FROM gaz GROUP BY norm),
    mention_counts AS (SELECT norm, count(*) AS n_mentions FROM final GROUP BY norm),
    ranked AS (
      SELECT norm, geo_id, v,
             row_number() OVER (PARTITION BY norm ORDER BY v DESC, geo_id ASC) AS rk
      FROM votes
    )
    SELECT m.norm, c.n_candidates, m.n_mentions,
           w.geo_id AS winner,
           w.v - coalesce(r2.v, 0) AS vote_margin
    FROM mention_counts m
    JOIN cands c ON c.norm = m.norm
    JOIN ranked w ON w.norm = m.norm AND w.rk = 1
    LEFT JOIN ranked r2 ON r2.norm = m.norm AND r2.rk = 2
    """,
)
def kg_ambiguity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.link import link_mentions, score_candidates

    variants = _oracle_variants(spark)
    mentions = _oracle_mentions(spark, sf_dir)
    winners = score_candidates(link_mentions(mentions, variants))

    cands = variants.groupBy("norm").agg(
        F.count_distinct("geo_id").alias("n_candidates")
    )
    mention_counts = mentions.groupBy("norm").agg(F.count("*").alias("n_mentions"))
    votes = winners.groupBy("norm", "geo_id").agg(F.count("*").alias("v"))
    w = Window.partitionBy("norm").orderBy(F.desc("v"), F.asc("geo_id"))
    ranked = votes.withColumn("rk", F.row_number().over(w))
    top = ranked.filter(F.col("rk") == 1).select("norm", F.col("geo_id").alias("winner"), F.col("v").alias("v1"))
    second = ranked.filter(F.col("rk") == 2).select("norm", F.col("v").alias("v2"))
    return (
        mention_counts.join(F.broadcast(cands), "norm")
        .join(F.broadcast(top), "norm")
        .join(F.broadcast(second), "norm", "left")
        .select(
            "norm",
            "n_candidates",
            "n_mentions",
            "winner",
            (F.col("v1") - F.coalesce("v2", F.lit(0))).alias("vote_margin"),
        )
    )


# --- fixed-grid spatial binning -----------------------------------------
@register(
    "geo_grid_cells",
    """
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 180) - 90 + 0.5 AS lat,
             (c_custkey % 360) - 180 + 0.5 AS lon
      FROM customer
    )
    SELECT CAST(floor(lat / 5) AS INT) AS cell_lat,
           CAST(floor(lon / 5) AS INT) AS cell_lon,
           count(*) AS n,
           round(avg(lat), 6) AS centroid_lat,
           round(avg(lon), 6) AS centroid_lon
    FROM pts GROUP BY 1, 2
    """,
)
def geo_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        ((F.col("c_custkey") % 180) - 90 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.5).alias("lon"),
    )
    return pts.groupBy(
        F.floor(F.col("lat") / 5).cast("int").alias("cell_lat"),
        F.floor(F.col("lon") / 5).cast("int").alias("cell_lon"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("lat"), 6).alias("centroid_lat"),
        F.round(F.avg("lon"), 6).alias("centroid_lon"),
    )
