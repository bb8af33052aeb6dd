"""LNEx-shaped compat API: initialize / initialize_using_files /
extract with full candidate sets."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lnex_spark import compat
from tests.conftest import to_spark_gaz, to_spark_transcripts


def test_initialize_and_extract_candidate_sets(spark, fixture_data):
    model = compat.initialize(
        spark, to_spark_gaz(spark, fixture_data["gaz"]), augment_type="HP"
    )
    out = compat.extract(model, to_spark_transcripts(spark, fixture_data["transcripts"]))
    rows = out.collect()
    assert len(rows) > 0
    # reference-shape contract: candidate SETS, not a single winner
    assert {"spotted_text", "candidate_names", "geo_ids"} <= set(out.columns)
    assert any(len(r["geo_ids"]) > 1 for r in rows)  # ambiguous names exist in the fixture
    # offsets index the original turn text
    texts = {
        (t["conv_id"], t["turn_idx"]): t["text"] for t in fixture_data["transcripts"]
    }
    for r in rows[:200]:
        assert texts[(r["conv_id"], r["turn_idx"])][r["start"] : r["end"]] == r["spotted_text"]


def test_initialize_using_files_matches_dataframe_init(spark, fixture_data, tmp_path):
    """The JSON-file entry point builds the same match structure as the
    DataFrame entry point on the same gazetteer content."""
    gaz_rows = fixture_data["gaz"]
    geo_locations: dict[str, list[int]] = {}
    geo_info: dict[str, dict] = {}
    for e in gaz_rows:
        for nm in [e["name"]] + list(e["alt_names"] or []):
            geo_locations.setdefault(nm, []).append(e["geo_id"])
        geo_info[str(e["geo_id"])] = {
            "name": e["name"],
            "category": e["category"],
            "geo_item": {"point": {"lat": e["lat"], "lon": e["lon"]}},
        }
    loc_p = tmp_path / "geo_locations.json"
    info_p = tmp_path / "geo_info.json"
    loc_p.write_text(json.dumps(geo_locations))
    info_p.write_text(json.dumps(geo_info))

    m_files = compat.initialize_using_files(spark, str(loc_p), str(info_p))
    m_df = compat.initialize(spark, to_spark_gaz(spark, gaz_rows))

    names_files = set(m_files.bc_struct.value.full_names)
    names_df = set(m_df.bc_struct.value.full_names)
    assert names_files == names_df

    t = to_spark_transcripts(spark, fixture_data["transcripts"])
    a = sorted(tuple(r) for r in compat.extract(m_files, t).collect())
    b = sorted(tuple(r) for r in compat.extract(m_df, t).collect())
    assert a == b


def test_model_save_load_roundtrip(spark, fixture_data, tmp_path):
    """Saved-model reload (reference cache=True parity) produces the
    same match structure and the same extraction output."""
    from lnex_spark.pipeline import load_gazetteer_model, save_gazetteer_model

    m = compat.initialize(spark, to_spark_gaz(spark, fixture_data["gaz"]))
    save_gazetteer_model(m, str(tmp_path / "model"))
    m2 = load_gazetteer_model(spark, str(tmp_path / "model"))

    assert set(m2.bc_struct.value.full_names) == set(m.bc_struct.value.full_names)
    assert m2.bc_struct.value.unigram == m.bc_struct.value.unigram
    t = to_spark_transcripts(spark, fixture_data["transcripts"])
    a = sorted(tuple(r) for r in compat.extract(m, t).collect())
    b = sorted(tuple(r) for r in compat.extract(m2, t).collect())
    assert a == b
