"""Spark gazetteer build (G1-G7) vs the pure-Python semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from lnex_spark.data import fixtures as FX
from lnex_spark.gazetteer.augment import normalize_name
from lnex_spark.gazetteer.build import (
    build_match_struct,
    build_name_variants,
    build_unigram_lm,
    normalize_names_col,
    scan_gazetteer,
)
from tests.conftest import to_spark_gaz, to_spark_stopwords, to_spark_wordlist


def test_normalize_col_parity(spark):
    """G2 column chain must agree with augment.normalize_name."""
    samples = [
        "Chennai International Airport",
        "  Guindy-Velachery   Road ",
        "T'Nagar!!",
        "Adyar/Besant Nagar",
        "café corner",
        "LAND of the Lakes MALL",
        "#weird (name)",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = {r["raw"]: r["norm"] for r in df.select("raw", normalize_names_col(F.col("raw")).alias("norm")).collect()}
    for s in samples:
        assert got[s] == normalize_name(s), s


def test_bbox_scan_filters(spark, fixture_data):
    gaz = to_spark_gaz(spark, fixture_data["gaz"])
    inside = scan_gazetteer(spark, gaz, FX.EVENTS["chennai"]["bbox"]).count()
    assert inside == len(fixture_data["gaz"])
    assert scan_gazetteer(spark, gaz, [0.0, 0.0, 1.0, 1.0]).count() == 0


def test_variant_table_matches_gold_map(spark, fixture_data):
    """The Spark variant table must equal the gold annotator's
    variant map: same (norm, geo_id, match_type) set."""
    gaz_df = to_spark_gaz(spark, fixture_data["gaz"])
    stop_df = to_spark_stopwords(spark, fixture_data["stopwords"])
    variants = build_name_variants(gaz_df, stop_df)
    got = {
        (r["norm"], r["geo_id"], r["match_type"])
        for r in variants.select("norm", "geo_id", "match_type").collect()
    }
    vmap = FX.build_variant_map(fixture_data["gaz"], set(fixture_data["stopwords"]))
    want = {(v, gid, mt) for v, cands in vmap.items() for gid, mt, _ in cands}
    assert got == want


def test_generic_names_filtered(spark, fixture_data):
    """G5: gazetteer names colliding with filler vocab must be dropped."""
    gaz_df = to_spark_gaz(spark, fixture_data["gaz"])
    stop_df = to_spark_stopwords(spark, fixture_data["stopwords"])
    variants = build_name_variants(gaz_df, stop_df)
    norms = {r[0] for r in variants.select("norm").distinct().collect()}
    for w in FX.GENERIC_NAME_WORDS:
        assert w not in norms


def test_unigram_lm_matches_gold(spark, fixture_data):
    gaz_df = to_spark_gaz(spark, fixture_data["gaz"])
    stop_df = to_spark_stopwords(spark, fixture_data["stopwords"])
    wl_df = to_spark_wordlist(spark, fixture_data["wordlist"])
    variants = build_name_variants(gaz_df, stop_df)
    lm = {r[0]: r[1] for r in build_unigram_lm(variants, wl_df).collect()}
    vmap = FX.build_variant_map(fixture_data["gaz"], set(fixture_data["stopwords"]))
    want = FX.build_lm(vmap, fixture_data["wordlist"])
    assert lm == want


def test_match_struct(spark, fixture_data):
    gaz_df = to_spark_gaz(spark, fixture_data["gaz"])
    stop_df = to_spark_stopwords(spark, fixture_data["stopwords"])
    variants = build_name_variants(gaz_df, stop_df)
    unigram = build_unigram_lm(variants, to_spark_wordlist(spark, fixture_data["wordlist"]))
    bc = build_match_struct(spark, variants, unigram)
    st = bc.value
    assert "adyar river" in st.prefixes or "adyar" in st.prefixes
    for name in st.full_names:
        toks = name.split(" ")
        assert len(toks) <= st.max_tokens
        assert " ".join(toks[:1]) in st.prefixes
