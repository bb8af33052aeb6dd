"""Graph operators over the KG / dedup layer: distributed connected
components and co-mention edge extraction.

Neither exists in the reference (LNEx processes one tweet at a time and
emits no graph); both are corpus-level operations the north rule's KG
materialization makes natural: near-duplicate PAIRS (operators/dedup.py)
only become a usable dedup decision once grouped into clusters, and a
mention-triple table begets a location co-occurrence graph.

Scale notes
-----------
``connected_components`` is iterative min-label propagation:

* each round is one keyed shuffle join (edges ⋈ labels) + one hash
  aggregation; rounds needed = graph diameter.  Near-dup graphs are
  shallow (copies of copies — diameter a handful), so O(diameter)
  rounds beat the constant-factor-heavy O(log n) star-contraction
  variants (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) for this workload; for adversarial diameters
  switch to alternating large-star/small-star — same join/agg
  primitives, fewer rounds.
* lineage is truncated every round (``localCheckpoint``; on a real
  cluster pass ``use_reliable_checkpoint=True`` after
  ``sc.setCheckpointDir``) — without this the plan doubles per
  iteration and the driver OOMs planning round ~20.
* the undirected edge list is repartitioned by source once and
  persisted, so every round's join reuses the same partitioning
  instead of re-shuffling the (big) edge side.

``comention_edges`` deliberately avoids a per-conversation self-join:
geo sets are collected per conversation (sorted, distinct) and the
i<j pairs unrolled with array ``transform``/``slice`` — one shuffle,
no O(|edges|²) join, with a ``max_geos_per_conv`` guard because a
conversation mentioning G locations yields G·(G-1)/2 pairs (the same
quadratic-postings trade documented for jaccard_pairs' stop-shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Symmetrize + dedupe an edge list into (a, b) both directions."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    return e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).where(
        F.col("a") != F.col("b")
    ).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """Distributed connected components by min-label propagation.

    Returns ``(node, component)`` for every node appearing in
    ``edges``; ``component`` is the smallest node id reachable from
    ``node`` (deterministic representative). Converges in
    graph-diameter rounds; raises if ``max_iter`` rounds pass without
    a fixpoint (pathological diameter → use star-contraction instead).
    """
    und = undirect(edges, src, dst)
    n_part = und.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    und = und.repartition(int(n_part), "a").persist()
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )

    def _truncate(df: DataFrame) -> DataFrame:
        if use_reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    labels = _truncate(labels)
    for _ in range(max_iter):
        prop = und.join(labels, und["a"] == labels["node"]).select(
            F.col("b").alias("node"), "component"
        )
        new_labels = _truncate(
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            und.unpersist()
            return labels
    und.unpersist()
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pair list → per-doc cluster assignment.

    ``pairs`` is any (doc_a, doc_b[, ...]) relation (jaccard_pairs,
    lsh_candidate_pairs, simhash_near_dups output). The returned
    ``(doc_id, cluster)`` keeps the minimum doc_id of each connected
    component as the canonical survivor — the usual "keep first, drop
    rest" dedup policy, made transitive."""
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


def pagerank(
    edges: DataFrame,
    src: str = "geo_a",
    dst: str = "geo_b",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Undirected PageRank (classic per-node form, rank₀ = 1, no 1/N
    normalization) over an edge list; returns ``(node, rank)``.

    Fixed ``iters`` rounds — each is one keyed shuffle join
    (edges ⋈ ranks ⋈ degrees) plus one hash aggregation. Undirected
    symmetrization means every node has degree ≥ 1, so there is no
    dangling-mass term. Floating-point determinism: partial-sum order
    varies across partitionings, so callers comparing across engines
    should round (the oracle rounds to 6 digits; contributions per
    node are few, error ~1e-15)."""
    und = undirect(edges, src, dst)
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    ranks = deg.select(F.col("a").alias("node"), F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contrib = (
            und.join(ranks.withColumnRenamed("node", "a"), "a")
            .join(deg, "a")
            .select(F.col("b").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")).alias("rank")
        )
    return ranks


def comention_edges(
    mention_triples: DataFrame, max_geos_per_conv: int | None = None
) -> DataFrame:
    """Location co-occurrence graph from mention triples.

    Input is the K1 mention-triple table
    ``(subj = 'conv_id#turn_idx', pred, obj = geo_id)``; output is
    ``(geo_a, geo_b, n_convs)`` with geo_a < geo_b — the number of
    conversations mentioning both locations. One shuffle (the
    conversation-level collect_set); pairs unrolled array-side."""
    conv_geo = mention_triples.select(
        F.substring_index("subj", "#", 1).alias("conv_id"),
        F.col("obj").cast("long").alias("geo"),
    )
    geo_sets = conv_geo.groupBy("conv_id").agg(
        F.sort_array(F.collect_set("geo")).alias("gs")
    )
    if max_geos_per_conv is not None:
        geo_sets = geo_sets.where(F.size("gs") <= max_geos_per_conv)
    gs = F.col("gs")
    pairs = F.flatten(
        F.transform(
            gs,
            lambda x, i: F.transform(
                F.slice(gs, i + F.lit(2), F.size(gs) - i - 1),
                lambda y: F.struct(x.alias("geo_a"), y.alias("geo_b")),
            ),
        )
    )
    return (
        geo_sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.geo_a").alias("geo_a"), F.col("p.geo_b").alias("geo_b"))
        .agg(F.count("*").alias("n_convs"))
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA).

    Seed: every node its own label. Each round, every node adopts its
    neighbors' most frequent label (ties → smallest label); isolated
    rounds keep the current label. A FIXED iteration count with fully
    deterministic tie-breaking makes the result exactly reproducible —
    the property the DuckDB oracle (unrolled iterations) checks — at
    the cost of the usual LPA caveat that synchronous updates may
    oscillate rather than converge; fixed-round LPA is the streaming/
    batch-friendly form.

    Per round: one join (edges x labels, co-partitioned on the edge
    key) + two hash aggs — same shuffle shape as connected_components
    but bounded rounds instead of a fixpoint loop, so lineage stays
    shallow without checkpoints.
    """
    und = undirect(edges, src, dst)
    n_part = und.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    und = und.repartition(int(n_part), "a").persist()
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iterations):
        msgs = und.join(labels, und["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        counts = msgs.groupBy("node", "label").agg(F.count("*").alias("c"))
        # most frequent neighbor label, smallest label on ties — an
        # orderable-struct max_by (partial-aggregating, no window)
        labels = counts.groupBy("node").agg(
            F.max_by("label", F.struct(F.col("c"), -F.col("label"))).alias("label")
        )
    und.unpersist()
    return labels


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Fixed-round k-core peeling: each round drops every node whose
    undirected degree is below ``k``, together with its edges, then
    recounts. Returns ``(node, deg)`` for survivors after ``rounds``
    peels (the k-core once a round removes nothing).

    The dense-subgraph filter of the co-mention graph — hub locations
    that survive peeling are the KG's load-bearing entities, while
    one-off co-occurrences fall away.  Fixed rounds (vs a fixpoint
    loop) keep lineage bounded, like label_propagation; per round the
    cost is one hash agg (degree) + two left-semi joins reusing the
    edge partitioning.  A peel can only shrink the graph, so the per
    round work is monotonically decreasing.
    """
    und = undirect(edges, src, dst)
    n_part = und.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    cur = und.repartition(int(n_part), "a").persist()
    for _ in range(rounds):
        keep = (
            cur.groupBy("a")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("a")
        )
        nxt = cur.join(keep, "a", "left_semi").join(
            keep.select(F.col("a").alias("b")), "b", "left_semi"
        )
        nxt = nxt.select("a", "b").persist()
        cur.unpersist()
        cur = nxt
    out = cur.groupBy("a").agg(F.count("*").alias("deg")).select(
        F.col("a").alias("node"), "deg"
    )
    return out


def link_prediction_scores(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Common-neighbors + Adamic-Adar link-prediction features for
    every NON-adjacent node pair sharing at least one neighbor — the
    candidate scores behind "these two locations probably belong in
    one KG cluster" edge suggestions.

    Shape: one triangle-style self-join of the undirected edge list on
    the shared-neighbor key (the same join class as tri_count), an
    anti-join to drop already-connected pairs, a broadcast of the
    node-count-sized degree table, and one hash agg.  Adamic-Adar
    weights each shared neighbor z by 1/ln(deg(z)) — rare hubs count
    more; degree-1 neighbors are excluded from the AA sum (ln 1 = 0),
    while cn counts all shared neighbors.

    Returns (x, y, cn, aa) with x < y.
    """
    und = undirect(edges, src, dst)
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).select(
        F.col("a").alias("z"), "deg"
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    cand = e1.join(e2, "z").filter(F.col("x") < F.col("y"))
    cand = cand.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    scored = cand.join(F.broadcast(deg), "z").groupBy("x", "y").agg(
        F.count("*").alias("cn"),
        F.round(
            F.sum(
                F.when(F.col("deg") >= 2, F.lit(1.0) / F.log(F.col("deg"))).otherwise(
                    0.0
                )
            ),
            6,
        ).alias("aa"),
    )
    return scored


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any landmark node,
    by fixed-round distance relaxation.

    ``sources`` is a one-column DataFrame of landmark node ids;
    returns ``(node, dist)`` for every node within ``max_hops`` of a
    landmark (unreached nodes are absent, not NULL — the frontier
    never visited them).  The landmark-distance sketch is the standard
    trick for approximating point-to-point distances on graphs too big
    for pairwise shortest paths: store |L| distances per node instead
    of |V|.

    Same shuffle shape as ``connected_components`` — per round one
    keyed join of the (repartitioned-once, persisted) undirected edge
    list against the current distance table plus one min-aggregation —
    but FIXED rounds, not a fixpoint loop, so the computation is a
    deterministic function of (edges, sources, max_hops) and an
    unrolled relational oracle can re-derive it exactly.  Lineage is
    truncated per round (localCheckpoint) like the other iterative
    graph ops.
    """
    und = undirect(edges, src, dst)
    n_part = und.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    und = und.repartition(int(n_part), "a").persist()
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        prop = und.join(dist, und["a"] == dist["node"]).select(
            F.col("b").alias("node"), (F.col("dist") + F.lit(1)).alias("dist")
        )
        dist = (
            dist.unionByName(prop)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return dist


def transitive_closure(
    edges: DataFrame,
    src: str = "child",
    dst: str = "parent",
    max_iter: int = 20,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """Transitive closure of a containment hierarchy by path doubling:
    ``(node, ancestor, depth)`` for every ancestor reachable from
    ``node`` along child→parent edges, ``depth`` = minimum hop count.

    The KG materialization's ``locatedIn`` triples form an admin
    hierarchy (venue → ward → city → state …); rollups "mentions of
    anywhere inside X" need the closure, not the raw edges. The
    reference has no graph layer at all (per-tweet extraction only) —
    this is the corpus-level operation its output begets.

    Scale notes:
      * path doubling squares reach per round — R ← R ∪ (R ⋈ R) — so
        a depth-d hierarchy closes in ⌈log₂ d⌉ joins, not d as in
        naive semi-naive iteration. Admin hierarchies are depth ≲ 12
        (OSM admin_level), i.e. 4 rounds.
      * each round is one self-join keyed on the frontier column plus
        one (node, ancestor) min-depth hash aggregation; lineage is
        truncated per round exactly like ``connected_components``
        (localCheckpoint locally; pass ``use_reliable_checkpoint=True``
        on a real cluster after ``sc.setCheckpointDir``).
      * output size is nodes × avg-ancestor-count — bounded by depth,
        NOT quadratic, for trees/DAG hierarchies. A cyclic input would
        never grow past the cycle's node set (min-depth keeps rows
        finite) but callers should treat a hit of ``max_iter`` as a
        data bug, which is why it raises instead of returning.
    """
    r = (
        edges.select(
            F.col(src).alias("node"), F.col(dst).alias("ancestor"), F.lit(1).alias("depth")
        )
        .where(F.col(src) != F.col(dst))
        .distinct()
    )

    def _truncate(df: DataFrame) -> DataFrame:
        if use_reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    r = _truncate(r)
    for _ in range(max_iter):
        hop = (
            r.alias("x")
            .join(r.alias("y"), F.col("x.ancestor") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("y.ancestor").alias("ancestor"),
                (F.col("x.depth") + F.col("y.depth")).alias("depth"),
            )
        )
        new_r = _truncate(
            r.unionByName(hop)
            .groupBy("node", "ancestor")
            .agg(F.min("depth").alias("depth"))
        )
        if new_r.count() == r.count():
            return new_r
        r = new_r
    raise RuntimeError(f"transitive_closure: no fixpoint after {max_iter} doubling rounds")


def rollup_by_closure(
    facts: DataFrame,
    closure: DataFrame,
    fact_key: str,
    measure_alias: str = "n_facts",
) -> DataFrame:
    """Hierarchy rollup: count facts per ancestor INCLUDING all
    descendants — ``(ancestor, n_facts)`` where a fact keyed on node v
    counts toward every ancestor of v and toward v itself.

    One join (facts ⋈ closure-with-self) + one hash aggregation; the
    closure side is ancestor-per-node rows (depth-bounded), so the
    join explodes each fact by its ancestor count — the standard
    fan-out of hierarchical aggregation, linear in depth, never
    quadratic. Facts keyed on a node outside the hierarchy are
    dropped (inner join) — rollup is defined over hierarchy members. Spark plans this with partial (map-side) counts before
    the exchange; at 100 TB the fact side shuffles once on the node
    key and the closure (gazetteer-sized) broadcasts.
    """
    members = (
        closure.select("node")
        .unionByName(closure.select(F.col("ancestor").alias("node")))
        .distinct()
    )
    with_self = closure.select("node", "ancestor").unionByName(
        members.select("node", F.col("node").alias("ancestor"))
    )
    f = facts.select(F.col(fact_key).alias("node"))
    return (
        f.join(F.broadcast(with_self), "node")
        .groupBy("ancestor")
        .agg(F.count("*").alias(measure_alias))
    )
