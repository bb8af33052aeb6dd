"""Scale-path fallbacks: results must be plan-invariant.

At planet scale the gazetteer can exceed the broadcast threshold and
Catalyst falls back to a shuffled join for L1 — the RESULTS must not
change. Likewise the match-struct build guards the driver against an
unscoped (planet-sized) gazetteer collect.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lnex_spark.gazetteer.build import build_match_struct, build_unigram_lm
from lnex_spark.operators.link import link_mentions, score_candidates
from tests.conftest import (
    to_spark_gaz,
    to_spark_stopwords,
    to_spark_transcripts,
    to_spark_wordlist,
)


def test_l1_results_identical_under_sort_merge_fallback(spark, fixture_data):
    """link+score output is identical with broadcast joins disabled
    (sort-merge / shuffled-hash path), i.e. correctness does not depend
    on the physical join strategy."""
    from lnex_spark.operators.extract import extract_mentions_df
    from lnex_spark.pipeline import build_gazetteer

    model = build_gazetteer(
        spark,
        to_spark_gaz(spark, fixture_data["gaz"]),
        to_spark_stopwords(spark, fixture_data["stopwords"]),
        to_spark_wordlist(spark, fixture_data["wordlist"]),
    )
    t = to_spark_transcripts(spark, fixture_data["transcripts"])
    mentions = extract_mentions_df(t, model.bc_struct)

    def run(hint: bool) -> list[tuple]:
        out = score_candidates(link_mentions(mentions, model.variants, hint_broadcast=hint))
        cols = sorted(out.columns)
        return sorted(tuple(r) for r in out.select(*cols).collect())

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    baseline = run(hint=True)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fallback = run(hint=False)  # no hint + no threshold -> SMJ path
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert baseline == fallback
    assert len(baseline) > 0


def test_match_struct_guard_rejects_unscoped_gazetteer(spark):
    variants = spark.range(0, 50).select(
        F.concat(F.lit("name"), F.col("id")).alias("norm")
    )
    lm = build_unigram_lm(variants.select("norm"), None)
    with pytest.raises(ValueError, match="bounding box"):
        build_match_struct(spark, variants, lm, max_names=10)
    # under the limit: builds fine
    bc = build_match_struct(spark, variants, lm, max_names=100)
    assert len(bc.value.full_names) == 50
