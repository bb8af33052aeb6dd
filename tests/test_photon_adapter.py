"""Photon/ES gazetteer adapter (G1 network path) against a canned ES
response fixture — the reference's build_bb_gazetteer semantics
(bbox envelope, name-variant extraction) without a live index."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
from lnex_spark.gazetteer.photon import gazetteer_from_photon, parse_photon_hits

# Canned Photon hits: 3 inside the Chennai bbox, 1 outside, 1 junk line.
HITS = [
    {
        "_id": "1",
        "_source": {
            "osm_id": 101,
            "osm_type": "W",
            "osm_key": "place",
            "osm_value": "suburb",
            "name": {"default": "Adyar", "en": "Adyar", "alt": "Adaiyaru", "old": "Adyar"},
            "coordinate": {"lat": 13.006, "lon": 80.257},
        },
    },
    {
        "_id": "2",
        "_source": {
            "osm_id": 102,
            "osm_type": "N",
            "osm_key": "amenity",
            "osm_value": "hospital",
            "name": {"default": "Apollo Hospital", "loc": "Apollo"},
            "coordinate": {"lat": 13.035, "lon": 80.251},
        },
    },
    {
        "_id": "3",
        "_source": {
            "osm_id": 103,
            "osm_type": "W",
            "osm_key": "waterway",
            "osm_value": "river",
            "name": {"default": "Cooum River"},
            "coordinate": {"lat": 13.07, "lon": 80.26},
        },
    },
    {  # outside the bbox — the envelope filter must drop it
        "_id": "4",
        "_source": {
            "osm_id": 999,
            "osm_type": "N",
            "osm_key": "place",
            "osm_value": "city",
            "name": {"default": "Mumbai"},
            "coordinate": {"lat": 19.07, "lon": 72.87},
        },
    },
]

CHENNAI_BB = [12.9, 80.1, 13.2, 80.35]


@pytest.fixture(scope="module")
def hits_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("photon") / "hits.jsonl"
    lines = [json.dumps(h) for h in HITS] + ["{not valid json"]
    p.write_text("\n".join(lines))
    return str(p)


def test_parse_and_bbox(spark, hits_path):
    hits = parse_photon_hits(spark, hits_path)
    gaz = gazetteer_from_photon(hits, bb=CHENNAI_BB, region="chennai")
    # junk line -> all-null struct -> dropped; Mumbai outside bbox -> dropped
    rows = {r["geo_id"]: r for r in gaz.collect()}
    assert set(rows) == {101, 102, 103}
    assert rows[101]["name"] == "Adyar"
    # variants exclude nulls and the default-name duplicate ("old": "Adyar")
    assert rows[101]["alt_names"] == ["Adaiyaru"]
    assert rows[102]["alt_names"] == ["Apollo"]
    assert rows[103]["alt_names"] == []
    assert rows[102]["category"] == "amenity:hospital"
    assert rows[101]["region"] == "chennai"


def test_schema_matches_engine_contract(spark, hits_path):
    gaz = gazetteer_from_photon(parse_photon_hits(spark, hits_path), bb=CHENNAI_BB)
    # field-for-field GAZETTEER_SCHEMA (region nullable string on both sides)
    assert [(f.name, f.dataType) for f in gaz.schema.fields] == [
        (f.name, f.dataType) for f in GAZETTEER_SCHEMA.fields
    ]


def test_feeds_compat_initialize_and_extract(spark, hits_path):
    """The VERDICT-flagged gap: compat.initialize(bb) fed by the ES
    adapter, end-to-end to extraction, on fixture data."""
    from lnex_spark import compat

    gaz = gazetteer_from_photon(parse_photon_hits(spark, hits_path), region="chennai")
    model = compat.initialize(spark, gaz, bb=CHENNAI_BB, augment_type="HP")
    transcripts = spark.createDataFrame(
        [
            ("c1", 0, "user", "flooding near adyar and apollo hospital", "", None),
            ("c1", 1, "assistant", "cooum river overflowing", "", None),
            ("c2", 0, "user", "nothing here", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = compat.extract(model, transcripts)
    rows = out.collect()
    spotted = {r["spotted_text"] for r in rows}
    assert {"adyar", "apollo hospital", "cooum river"} <= spotted
    # bbox scoping: Mumbai (outside bb) must not be linkable
    all_geo = {g for r in rows for g in r["geo_ids"]}
    assert 999 not in all_geo
