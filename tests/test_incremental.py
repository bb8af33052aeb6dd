"""Incremental KG maintenance ≡ full batch: processing transcripts in
arbitrary batch splits through the maintained vote table yields
exactly the triples of the from-scratch pipeline, including when a
later batch flips a canonical winner."""

from __future__ import annotations

from pyspark.sql import functions as F

from lnex_spark.operators.incremental import (
    batch_votes,
    canonical_from_votes,
    merge_votes,
)
from lnex_spark.operators.link import apply_canonical, canonicalize
from lnex_spark.operators.triples import mention_triples

WINNER_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, surface string, "
    "norm string, geo_id long, match_type int, cat_priority int"
)


def _winners(spark, rows):
    return spark.createDataFrame(
        [(c, t, s, s + 5, n, n, g, 1, 3) for c, t, s, n, g in rows], WINNER_SCHEMA
    )


def _triples(winners):
    canon = canonicalize(winners)
    return sorted(map(tuple, mention_triples(apply_canonical(winners, canon)).collect()))


def _triples_incremental(spark, batches):
    votes = None
    seen = []
    for rows in batches:
        w = _winners(spark, rows)
        votes = merge_votes(votes, batch_votes(w))
        seen.append(w)
    all_winners = seen[0]
    for w in seen[1:]:
        all_winners = all_winners.unionByName(w)
    canon = canonical_from_votes(votes)
    return sorted(map(tuple, mention_triples(apply_canonical(all_winners, canon)).collect()))


def test_incremental_equals_batch_with_canonical_flip(spark):
    # batch 1: geo 7 leads the vote for "adyar" 2:1
    b1 = [("c1", 0, 0, "adyar", 7), ("c1", 1, 0, "adyar", 7), ("c2", 0, 0, "adyar", 3)]
    # batch 2: geo 3 overtakes (now 3:2) -> canonical flips to 3
    b2 = [("c3", 0, 0, "adyar", 3), ("c3", 1, 0, "adyar", 3), ("c4", 0, 0, "beach", 9)]

    inc = _triples_incremental(spark, [b1, b2])
    full = _triples(_winners(spark, b1 + b2))
    assert inc == full
    # and the flip really happened: every adyar mention links to geo 3
    objs = {obj for subj, pred, obj in inc if subj.startswith(("c1", "c2", "c3"))}
    assert objs == {3}


def test_incremental_split_invariance(spark):
    rows = [
        (f"c{i}", j, 10 * j, n, g)
        for i, (n, g) in enumerate(
            [("adyar", 7), ("adyar", 3), ("beach", 9), ("beach", 9), ("fort", 1)] * 4
        )
        for j in range(2)
    ]
    full = _triples(_winners(spark, rows))
    for split in (1, 2, 5):
        k = len(rows) // split
        batches = [rows[i : i + k] for i in range(0, len(rows), k)]
        assert _triples_incremental(spark, batches) == full


def test_vote_tiebreak_matches_canonicalize(spark):
    # equal votes -> smaller geo_id, same as link.canonicalize
    rows = [("c1", 0, 0, "adyar", 7), ("c2", 0, 0, "adyar", 3)]
    w = _winners(spark, rows)
    a = sorted(map(tuple, canonical_from_votes(batch_votes(w)).collect()))
    b = sorted(map(tuple, canonicalize(w).collect()))
    assert a == b == [("adyar", 3)]
