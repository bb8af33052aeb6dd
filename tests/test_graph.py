"""Graph operators: connected components (multi-hop, determinism,
convergence) and co-mention edge extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from lnex_spark.operators.graph import (
    comention_edges,
    connected_components,
    dedup_clusters,
    undirect,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_cc_multihop_chain(spark):
    # 1-2-3-4 chain (diameter 3), isolated pair 10-11, triangle 20-21-22
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)])
    got = {
        (r.node, r.component)
        for r in connected_components(e).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_cc_direction_and_self_loop_insensitive(spark):
    # reversed edges, duplicates, self-loops: same components
    e = _edges(spark, [(2, 1), (3, 2), (4, 3), (1, 1), (4, 3)])
    got = {(r.node, r.component) for r in connected_components(e).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_cc_deterministic_across_parallelism(spark):
    import random

    rng = random.Random(42)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e1 = _edges(spark, pairs).repartition(1)
    e7 = _edges(spark, pairs).repartition(7)
    r1 = sorted((r.node, r.component) for r in connected_components(e1).collect())
    r7 = sorted((r.node, r.component) for r in connected_components(e7).collect())
    assert r1 == r7
    # representative is the component minimum
    comps: dict[int, list[int]] = {}
    for node, comp in r1:
        comps.setdefault(comp, []).append(node)
    for comp, nodes in comps.items():
        assert comp == min(nodes)


def test_cc_max_iter_guard(spark):
    import pytest

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_iter=1)


def test_dedup_clusters_schema(spark):
    e = _edges(spark, [(5, 9), (9, 7)])
    out = dedup_clusters(e)
    assert out.columns == ["doc_id", "cluster"]
    got = {(r.doc_id, r.cluster) for r in out.collect()}
    assert got == {(5, 5), (9, 5), (7, 5)}


def test_undirect_symmetrizes(spark):
    e = _edges(spark, [(1, 2), (2, 1), (3, 3)])
    got = {(r.a, r.b) for r in undirect(e).collect()}
    assert got == {(1, 2), (2, 1)}


def test_pagerank_matches_reference(spark):
    from lnex_spark.operators.graph import pagerank

    # path graph 1-2-3: degrees 1,2,1
    e = spark.createDataFrame([(1, 2), (2, 3)], "geo_a long, geo_b long")
    got = {r.node: r.rank for r in pagerank(e, iters=3).collect()}

    # same recurrence in plain python
    ranks = {1: 1.0, 2: 1.0, 3: 1.0}
    deg = {1: 1, 2: 2, 3: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    for _ in range(3):
        ranks = {
            n: 0.15 + 0.85 * sum(ranks[m] / deg[m] for m in nbrs[n]) for n in ranks
        }
    assert got.keys() == ranks.keys()
    for n in ranks:
        assert abs(got[n] - ranks[n]) < 1e-9


def test_pagerank_deterministic_across_parallelism(spark):
    from lnex_spark.operators.graph import pagerank

    pairs = [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20]
    e1 = spark.createDataFrame(pairs, "geo_a long, geo_b long").repartition(1)
    e5 = spark.createDataFrame(pairs, "geo_a long, geo_b long").repartition(5)
    r1 = sorted((r.node, round(r.rank, 9)) for r in pagerank(e1).collect())
    r5 = sorted((r.node, round(r.rank, 9)) for r in pagerank(e5).collect())
    assert r1 == r5


def test_comention_edges_pairs_and_counts(spark):
    triples = spark.createDataFrame(
        [
            ("c1#0", "mentionsLocation", 7),
            ("c1#1", "mentionsLocation", 3),
            ("c1#2", "mentionsLocation", 7),  # dup mention, same conv
            ("c2#0", "mentionsLocation", 3),
            ("c2#5", "mentionsLocation", 7),
            ("c3#0", "mentionsLocation", 3),  # single-geo conv: no pairs
        ],
        "subj string, pred string, obj long",
    )
    got = {(r.geo_a, r.geo_b, r.n_convs) for r in comention_edges(triples).collect()}
    assert got == {(3, 7, 2)}


def test_comention_max_geos_guard(spark):
    triples = spark.createDataFrame(
        [("c1#0", "p", g) for g in range(10)] + [("c2#0", "p", 1), ("c2#1", "p", 2)],
        "subj string, pred string, obj long",
    )
    out = comention_edges(triples, max_geos_per_conv=5)
    got = {(r.geo_a, r.geo_b) for r in out.collect()}
    assert got == {(1, 2)}  # the 10-geo conversation is capped out


def test_label_propagation_two_cliques(spark):
    from lnex_spark.operators.graph import label_propagation

    # two 4-cliques {0..3} and {10..13}: LPA must give each clique one
    # community and never merge them (no bridge edge)
    cl = lambda base: [(base + i, base + j) for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(cl(0) + cl(10), "doc_a long, doc_b long")
    out = {r.node: r.label for r in label_propagation(edges, iterations=3).collect()}
    assert len({out[n] for n in range(4)}) == 1
    assert len({out[n] for n in range(10, 14)}) == 1
    assert out[0] != out[10]


def test_label_propagation_deterministic_across_parallelism(spark):
    from pyspark.sql import functions as F

    from lnex_spark.operators.graph import label_propagation

    edges = spark.range(60).select(
        (F.col("id") % 30).alias("doc_a"), ((F.col("id") * 7 + 3) % 30).alias("doc_b")
    ).where(F.col("doc_a") != F.col("doc_b"))
    a = sorted(map(tuple, label_propagation(edges, 3).collect()))
    b = sorted(map(tuple, label_propagation(edges.repartition(13), 3).collect()))
    assert a == b


def test_bfs_distances_chain_and_horizon(spark):
    from lnex_spark.operators.graph import bfs_distances

    # 1-2-3-4-5 chain; landmark at 1: node 5 is 4 hops out -> absent
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,)], "node long")
    got = {(r.node, r.dist) for r in bfs_distances(e, src, max_hops=3).collect()}
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3)}


def test_bfs_distances_multi_source_min(spark):
    from lnex_spark.operators.graph import bfs_distances

    # landmarks at both ends of a chain: middle node takes the min side
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,), (5,)], "node long")
    got = {(r.node, r.dist) for r in bfs_distances(e, src, max_hops=3).collect()}
    assert got == {(1, 0), (2, 1), (3, 2), (4, 1), (5, 0)}


def _tree(spark, pairs):
    return spark.createDataFrame(pairs, "child long, parent long")


def test_transitive_closure_chain_and_branch(spark):
    from lnex_spark.operators.graph import transitive_closure

    # chain 1->2->3->4->5 (depth 4, needs 2 doubling rounds) + branch 6->3
    e = _tree(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (6, 3)])
    got = {(r.node, r.ancestor, r.depth) for r in transitive_closure(e).collect()}
    assert got == {
        (1, 2, 1), (1, 3, 2), (1, 4, 3), (1, 5, 4),
        (2, 3, 1), (2, 4, 2), (2, 5, 3),
        (3, 4, 1), (3, 5, 2),
        (4, 5, 1),
        (6, 3, 1), (6, 4, 2), (6, 5, 3),
    }


def test_transitive_closure_dag_min_depth_and_self_loops(spark):
    from lnex_spark.operators.graph import transitive_closure

    # diamond: 1->2->4, 1->3->4, plus shortcut 1->4 (min depth wins);
    # self-loop dropped on entry
    e = _tree(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (1, 4), (5, 5)])
    got = {(r.node, r.ancestor, r.depth) for r in transitive_closure(e).collect()}
    assert got == {
        (1, 2, 1), (1, 3, 1), (1, 4, 1),
        (2, 4, 1), (3, 4, 1),
    }


def test_transitive_closure_cycle_raises(spark):
    import pytest

    from lnex_spark.operators.graph import transitive_closure

    # a 2-cycle reaches a fixpoint of (1,2),(2,1),(1,1),(2,2)... min-depth
    # keeps it finite, so it converges rather than raising; max_iter=0
    # forces the raise path instead.
    e = _tree(spark, [(1, 2), (2, 3)])
    with pytest.raises(RuntimeError):
        transitive_closure(e, max_iter=0)


def test_rollup_by_closure_counts_include_descendants(spark):
    from lnex_spark.operators.graph import rollup_by_closure, transitive_closure

    # hierarchy: 1->10, 2->10, 10->100 ; facts on 1,1,2,10,100
    e = _tree(spark, [(1, 10), (2, 10), (10, 100)])
    closure = transitive_closure(e)
    facts = spark.createDataFrame([(1,), (1,), (2,), (10,), (100,)], "k long")
    got = {(r.ancestor, r.n_facts) for r in rollup_by_closure(facts, closure, "k").collect()}
    # node 100 (root, ancestor-only) sees all 5; node 10 sees 1,1,2 + itself
    assert got == {(1, 2), (2, 1), (10, 4), (100, 5)}


def test_rollup_by_closure_drops_out_of_hierarchy_facts(spark):
    from lnex_spark.operators.graph import rollup_by_closure, transitive_closure

    e = _tree(spark, [(1, 10)])
    closure = transitive_closure(e)
    facts = spark.createDataFrame([(1,), (999,)], "k long")
    got = {(r.ancestor, r.n_facts) for r in rollup_by_closure(facts, closure, "k").collect()}
    assert got == {(1, 1), (10, 1)}
