"""REGISTRY.md freshness gate (VERDICT r04 item 8): the generated
operator index must match the registry exactly — op set, module:line
locations, oracle kinds, and driver-check history.  Regenerate with
``python tools/gen_registry.py`` after adding/moving an op."""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_registry_md_is_fresh():
    import gen_registry

    expected = gen_registry.build_markdown()
    target = ROOT / "REGISTRY.md"
    assert target.exists(), "REGISTRY.md missing — run python tools/gen_registry.py"
    assert target.read_text() == expected, (
        "REGISTRY.md is stale — run python tools/gen_registry.py"
    )


def test_registry_md_covers_every_op():
    import gen_registry

    from lnex_spark.oracles import spark_queries

    locs = gen_registry.op_locations()
    missing = [k for k in spark_queries() if k not in locs]
    assert missing == [], f"ops with no @register location found: {missing[:10]}"
