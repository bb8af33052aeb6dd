"""Process-kill resume torture (VERDICT r04 item 2), opt-in.

tests/test_resume.py covers the simulated stop; this drives
tools/resume_torture.py — a REAL SIGKILL of the driver JVM mid-batch
followed by a fresh-process resume — at a small scale.  Three JVM
boots make it ~2-3 min, so it is env-gated:

    RESUME_TORTURE=1 python -m pytest tests/test_resume_torture.py -q

The 10M-turn point is run per-round via
``python tools/resume_torture.py 2000 16`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("RESUME_TORTURE") != "1",
    reason="3 JVM boots (~2-3 min); opt in with RESUME_TORTURE=1",
)


def test_sigkill_mid_batch_resume_is_bit_identical():
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "resume_torture.py"), "40", "4", "2"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["identical"] is True
    assert verdict["n_triples"] > 0
    # the kill must actually have cost less than one full re-run
    assert verdict["resume_wall_s"] < verdict["ref_wall_s"]
