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


# ----------------------------------------------------------------------
# Triple-set MERGE (assert/retract) + snapshot CDC
# ----------------------------------------------------------------------

def _tset(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj long")


def _uset(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj long, op string")


def test_merge_triples_all_four_cases(spark):
    from lnex_spark.operators.incremental import merge_triples

    existing = _tset(spark, [("a", "p", 1), ("b", "p", 2), ("c", "p", 3)])
    upd = _uset(
        spark,
        [
            ("a", "p", 1, "retract"),   # retract existing
            ("b", "p", 2, "assert"),    # assert duplicate (idempotent)
            ("d", "p", 4, "assert"),    # assert new
            ("z", "p", 99, "retract"),  # retract absent (no-op)
        ],
    )
    got = sorted(map(tuple, merge_triples(existing, upd).collect()))
    assert got == [("b", "p", 2), ("c", "p", 3), ("d", "p", 4)]


def test_merge_triples_assert_wins_within_batch(spark):
    from lnex_spark.operators.incremental import merge_triples

    existing = _tset(spark, [("a", "p", 1)])
    upd = _uset(spark, [("a", "p", 1, "retract"), ("a", "p", 1, "assert")])
    got = sorted(map(tuple, merge_triples(existing, upd).collect()))
    assert got == [("a", "p", 1)]


def test_merge_snapshot_and_diff_roundtrip(spark, tmp_path):
    from lnex_spark.operators.incremental import (
        merge_triples_snapshot,
        snapshot_diff,
    )
    from lnex_spark.sources.tableformat import read_snapshot, write_snapshot

    base = str(tmp_path / "kg")
    v1 = write_snapshot(_tset(spark, [("a", "p", 1), ("b", "p", 2)]), base)
    upd = _uset(spark, [("a", "p", 1, "retract"), ("c", "p", 3, "assert")])
    v2 = merge_triples_snapshot(spark, base, upd)
    assert (v1, v2) == (1, 2)

    # final state via the pointer
    got = sorted(map(tuple, read_snapshot(spark, base).collect()))
    assert got == [("b", "p", 2), ("c", "p", 3)]
    # time travel still sees v1
    old = sorted(map(tuple, read_snapshot(spark, base, version=1).collect()))
    assert old == [("a", "p", 1), ("b", "p", 2)]
    # CDC between versions
    diff = sorted(map(tuple, snapshot_diff(spark, base, 1, 2).collect()))
    assert diff == [("a", "p", 1, "removed"), ("c", "p", 3, "added")]


def test_merge_snapshot_retry_converges(spark, tmp_path):
    """Re-applying the same batch (crash-retry) yields the same final
    state — one extra version, identical rows."""
    from lnex_spark.operators.incremental import merge_triples_snapshot
    from lnex_spark.sources.tableformat import read_snapshot, write_snapshot

    base = str(tmp_path / "kg")
    write_snapshot(_tset(spark, [("a", "p", 1)]), base)
    upd = _uset(spark, [("b", "p", 2, "assert"), ("a", "p", 1, "retract")])
    merge_triples_snapshot(spark, base, upd)
    first = sorted(map(tuple, read_snapshot(spark, base).collect()))
    merge_triples_snapshot(spark, base, upd)  # retry
    second = sorted(map(tuple, read_snapshot(spark, base).collect()))
    assert first == second == [("b", "p", 2)]
