"""Physical-plan audit as a regression gate, opt-in.

tools/explain_audit.py greps the formatted plans of the engine's key
operators for the shapes we require at scale (flagship broadcast join,
pushdown, codegen fusion, no-join as-of, no-Python minhash, ...); the
closing gates run it by hand each round.  This test runs the same
audit in a subprocess and asserts zero want/forbid failures, so a
plan-shape regression (a lost broadcast, a reintroduced self-join, a
Python island reappearing in a relational pipeline) fails CI instead
of only the next manual audit.

Boots a Spark JVM and plans ~25 operators (~2-4 min), so env-gated:

    PLAN_AUDIT=1 python -m pytest tests/test_plan_audit.py -q
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("PLAN_AUDIT") != "1",
    reason="boots Spark and plans ~25 operators (~2-4 min); opt in with PLAN_AUDIT=1",
)


def test_plan_audit_has_zero_failures():
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "explain_audit.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    m = re.search(r"^(\d+) plan-check failures$", out.stdout, re.M)
    assert m, "audit summary line missing:\n" + out.stdout[-3000:]
    failed = [
        ln
        for ln in out.stdout.splitlines()
        if ln.endswith("MISSING") or ln.endswith("VIOLATED")
    ]
    assert m.group(1) == "0", "plan-shape regressions:\n" + "\n".join(failed)
