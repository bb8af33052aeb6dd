"""Differential test: the broadcast-free relational matcher
(operators/extract_relational.py) must emit byte-identical mentions to
the broadcast-dict matcher on the event fixtures — hashtags, breaks,
overlaps and all."""

from __future__ import annotations

from pyspark.sql import functions as F

from lnex_spark.gazetteer.build import build_match_struct, build_unigram_lm
from lnex_spark.operators.extract import extract_mentions_df
from lnex_spark.operators.extract_relational import (
    extract_mentions_relational,
    ngram_candidates,
    tokenize_relational,
)
from lnex_spark.pipeline import build_gazetteer
from tests.conftest import (
    to_spark_gaz,
    to_spark_stopwords,
    to_spark_transcripts,
    to_spark_wordlist,
)


def _mentions_pair(spark, fixture_data):
    model = build_gazetteer(
        spark,
        to_spark_gaz(spark, fixture_data["gaz"]),
        to_spark_stopwords(spark, fixture_data["stopwords"]),
        to_spark_wordlist(spark, fixture_data["wordlist"]),
    )
    t = to_spark_transcripts(spark, fixture_data["transcripts"])
    bc_unigram = spark.sparkContext.broadcast(model.bc_struct.value.unigram)
    broadcast_path = extract_mentions_df(t, model.bc_struct)
    relational_path = extract_mentions_relational(
        t,
        model.variants,
        max_tokens=model.bc_struct.value.max_tokens,
        bc_unigram=bc_unigram,
    )
    return broadcast_path, relational_path, t


def test_relational_equals_broadcast(spark, fixture_data):
    b, r, t = _mentions_pair(spark, fixture_data)
    got_b = sorted(map(tuple, b.collect()))
    got_r = sorted(map(tuple, r.collect()))
    assert got_b == got_r
    assert len(got_b) > 50  # fixtures plant plenty of mentions
    # offset invariant holds on the relational path too
    joined = r.join(t.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    bad = joined.where(
        F.expr("substring(text, start + 1, end - start)") != F.col("surface")
    ).count()
    assert bad == 0


def test_relational_no_broadcast_of_gazetteer(spark, fixture_data):
    """The gazetteer join must stay a real join (semi), not a
    collected dict: the plan contains a Join on norm and no
    python-side dependency on the match struct."""
    _, r, _ = _mentions_pair(spark, fixture_data)
    plan = r._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_fuzz_differential_random_texts(spark):
    """300 adversarial random texts (punctuation, hashtags, URLs,
    @mentions, numbers, overlap-bait names) + a random gazetteer:
    both matcher paths must agree exactly."""
    import random

    rng = random.Random(4242)
    vocab = "adyar river guindy lake park north new old beach road x7 42".split()
    extras = ["#adyarriver", "#lakepark", "@user", "http://x.io/a", ",", ".", "!", "--"]
    names = set()
    while len(names) < 25:
        n = rng.randint(1, 3)
        names.add(" ".join(rng.sample(vocab, n)))
    rows = []
    for i in range(300):
        k = rng.randint(0, 18)
        words = [rng.choice(vocab + extras) for _ in range(k)]
        rows.append((f"c{i}", 0, "user", " ".join(words), None, None))
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    variants = spark.createDataFrame(
        [(n, i + 1, 1, "poi", 13.0, 80.0, "r", 3) for i, n in enumerate(sorted(names))],
        "norm string, geo_id long, match_type int, category string, "
        "lat double, lon double, region string, cat_priority int",
    )
    unigram = spark.createDataFrame(
        [(w, 5) for w in vocab], "token string, freq long"
    )

    from lnex_spark.gazetteer.build import build_match_struct

    bc = build_match_struct(spark, variants, unigram)
    bc_uni = spark.sparkContext.broadcast(bc.value.unigram)
    got_b = sorted(map(tuple, extract_mentions_df(t, bc).collect()))
    got_r = sorted(
        map(
            tuple,
            extract_mentions_relational(
                t, variants, max_tokens=bc.value.max_tokens, bc_unigram=bc_uni
            ).collect(),
        )
    )
    assert got_b == got_r
    assert len(got_b) > 100  # the fuzz actually generates matches


def test_segments_block_ngrams_across_breaks(spark):
    tokens = tokenize_relational(
        spark.createDataFrame(
            [("c1", 0, "madras city, beach road")], "conv_id string, turn_idx int, text string"
        )
    )
    cands = {r.norm for r in ngram_candidates(tokens, 3).collect()}
    assert "madras city" in cands and "beach road" in cands
    assert "city beach" not in cands  # the comma breaks adjacency
    assert "madras city beach" not in cands


def test_big_gazetteer_plan_never_broadcasts_gazetteer_side(spark):
    """Planet-scale contract (VERDICT r03 item 4): when the gazetteer
    exceeds the broadcast threshold, the candidate↔gazetteer semi-join
    must plan as a shuffle join (SMJ/shuffled-hash), NOT a broadcast of
    the gazetteer side — and the matcher's output must be unchanged
    from the small-gazetteer run (synthetic names never match).

    Catalyst has no stats for a range()-derived frame, but to pin the
    SIZE-based decision we shrink the threshold instead of growing the
    data: same decision path a 100M-name gazetteer hits at the default
    64MB threshold (tools/biggaz_bench.py measures the real 4M-name
    case)."""
    from pyspark.sql import functions as F

    t = spark.createDataFrame(
        [("c1", 0, "madras city near beach road"), ("c1", 1, "no places here")],
        "conv_id string, turn_idx int, text string",
    )
    fixture = spark.createDataFrame([("madras city",), ("beach road",)], "norm string")
    synth = spark.range(50_000).select(
        F.concat(F.lit("zzq"), F.col("id").cast("string")).alias("norm")
    )
    variants = fixture.unionByName(synth)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64KB")
        m = extract_mentions_relational(t, variants, max_tokens=3)
        got = sorted((r["turn_idx"], r["surface"]) for r in m.collect())
        plan = m._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert got == [(0, "beach road"), (0, "madras city")]
    semi_nodes = [ln for ln in plan.split("\n") if "LeftSemi" in ln]
    assert semi_nodes, "expected a semi join against the gazetteer"
    assert all("Broadcast" not in ln for ln in semi_nodes), semi_nodes
