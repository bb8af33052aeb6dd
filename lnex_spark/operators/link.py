"""Entity linking, candidate scoring, canonicalization (L1, L2, L3).

Reference behavior: LNEx returns the full candidate geo-id set per
mention (a dict lookup at match time ≙ a broadcast hash equi-join);
the scoring/canonicalization layer is the KG mandate on top (SURVEY.md
§2A L2/L3). All relational, all built-ins:

  L1  mentions ⋈ broadcast(variants) on norm     — broadcast hash join,
      zero shuffle (gazetteer ≪ transcripts, the defining asymmetry)
  L2  row_number over (mention) ordered by the deterministic score
      (match_type desc, cat_priority asc, geo_id asc)
  L3  two-stage hash agg: votes per (norm, geo_id) → majority winner
      per norm (count desc, geo_id asc) — tiny shuffle (distinct
      surface forms, not turns)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_mentions(
    mentions: DataFrame, variants: DataFrame, hint_broadcast: bool = True
) -> DataFrame:
    """L1: surface form → candidate geo entities (broadcast hash join).

    ``hint_broadcast=False`` drops the hint for the planet-scale case
    where the gazetteer exceeds broadcast limits — Catalyst then picks
    sort-merge, and results are identical (plan-invariance is tested in
    tests/test_scale_fallbacks.py)."""
    gaz = variants.select("norm", "geo_id", "match_type", "cat_priority", "category", "region")
    if hint_broadcast:
        gaz = F.broadcast(gaz)
    return mentions.join(gaz, on="norm", how="inner")


def score_candidates(linked: DataFrame) -> DataFrame:
    """L2: keep the best candidate per mention span, deterministically."""
    w = Window.partitionBy("conv_id", "turn_idx", "start", "end").orderBy(
        F.col("match_type").desc(), F.col("cat_priority").asc(), F.col("geo_id").asc()
    )
    return (
        linked.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def canonicalize(winners: DataFrame) -> DataFrame:
    """L3: one geo entity per normalized surface form, corpus-wide
    majority vote over L2 winners (ties → smaller geo_id)."""
    votes = winners.groupBy("norm", "geo_id").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("norm").orderBy(F.col("votes").desc(), F.col("geo_id").asc())
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("norm", F.col("geo_id").alias("canonical_geo_id"))
    )


def apply_canonical(winners: DataFrame, canon: DataFrame) -> DataFrame:
    """Rewrite every mention to its surface form's canonical entity."""
    return (
        winners.join(F.broadcast(canon), on="norm", how="inner")
        .drop("geo_id")
        .withColumnRenamed("canonical_geo_id", "geo_id")
    )
