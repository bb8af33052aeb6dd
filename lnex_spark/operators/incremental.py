"""Incremental KG maintenance: process transcript batches as they
arrive, keep a persistent (norm, geo_id) vote table, and re-derive
canonical triples — provably equal to rerunning the full-batch
pipeline over everything seen so far.

Why this shape: L3 canonicalization is a corpus-GLOBAL majority vote,
so naive incremental processing (canonicalize each batch alone) gives
different triples than the batch pipeline. But the vote table is an
ASSOCIATIVE aggregate — counts add — so the global vote is maintainable
with one tiny merge per batch:

    votes_n = merge(votes_{n-1}, count(new L2 winners))
    canon_n = argmax per norm over votes_n          (same tie-break)
    triples_n = winners_{1..n} rewritten by canon_n

Only the vote MERGE is incremental state (norm × geo_id — bounded by
the gazetteer, tiny); accumulated winners live in the bucket-
partitioned winners table the resumable pipeline already writes (X3),
so nothing new is stored per turn. A late batch can flip a canonical
winner — exactly as rerunning the batch pipeline would — and the
rewrite step re-emits from the winners table, so triples always equal
the from-scratch result (asserted by tests/test_incremental.py).

At cluster scale the vote table is a single small partitioned table
merged with one keyed aggregation per batch; the rewrite is the same
broadcast join as apply_canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOTES_SCHEMA = "norm string, geo_id long, votes long"


def batch_votes(winners: DataFrame) -> DataFrame:
    """Vote contribution of one batch of L2 winners."""
    return winners.groupBy("norm", "geo_id").agg(F.count("*").alias("votes"))


def merge_votes(existing: DataFrame | None, new: DataFrame) -> DataFrame:
    """Associative vote merge — the ONLY incremental state transition."""
    if existing is None:
        return new
    return (
        existing.unionByName(new)
        .groupBy("norm", "geo_id")
        .agg(F.sum("votes").alias("votes"))
    )


def canonical_from_votes(votes: DataFrame) -> DataFrame:
    """Same argmax + tie-break as link.canonicalize (highest votes,
    smallest geo_id), but over the maintained table."""
    return votes.groupBy("norm").agg(
        F.max_by(
            "geo_id", F.struct(F.col("votes").alias("v"), (-F.col("geo_id")).alias("g"))
        ).alias("canonical_geo_id")
    )
