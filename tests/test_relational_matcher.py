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
