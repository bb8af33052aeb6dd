"""Checkpoint-resume torture at scale (VERDICT r04 item 2).

tests/test_resume.py proves resume correctness with a SIMULATED
in-process stop (fail_after_batches) on a small fixture.  This tool is
the hostile version: a REAL ``kill -9`` of the driver JVM mid-batch at
the skew-bench scale, on the corpus with the planted ~20%-hot
conversation, then a fresh-process resume — asserting the final
triples are bit-identical to an uninterrupted run and reporting the
resume overhead.

Protocol (3 subprocesses, each a fresh JVM — resume must survive
process death, not an exception):
  1. ref     uninterrupted run_resumable(all buckets) + finalize →
             canonical sha256 over sorted triple rows; wall recorded.
  2. victim  same job, killed with SIGKILL as soon as the manifest
             shows >=1 committed batch plus a short randomized delay —
             the kill lands inside batch 2's extract/write window.
  3. resume  fresh process: run_resumable picks up ONLY pending
             buckets, finalize → canonical hash must equal ref's.

Overhead = (victim_wall_until_kill + resume_wall) - ref_wall: the cost
of the kill is bounded by one batch (the in-flight batch's work is
redone; committed buckets are never re-extracted — the resume log
prints which buckets ran).

Usage:
    python tools/resume_torture.py [replicas] [cores] [kill_extra_sec]
    # 10M-turn point: python tools/resume_torture.py 2000 16
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CHILD = """
import sys, hashlib, json, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from lnex_spark.data import fixtures as FX
from lnex_spark.data.derive import transcripts_from_documents
from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
from lnex_spark.pipeline import build_gazetteer, finalize_triples, run_resumable
from lnex_spark.session import get_spark

mode = {mode!r}
t0 = time.monotonic()
spark = get_spark(master="local[{cores}]", app_name="resume_torture_" + mode,
                  shuffle_partitions={cores})
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t = transcripts_from_documents(docs, replicas={replicas}).select(
    "conv_id", "turn_idx", "role", "text")
gaz = spark.createDataFrame(FX.gen_gazetteer("chennai"), GAZETTEER_SCHEMA)
stop = spark.createDataFrame([(w,) for w in FX.gen_stopwords()], "word string")
wl = spark.createDataFrame(FX.gen_wordlist(), "word string, freq long")
model = build_gazetteer(spark, gaz, stop, wl)
model.variants.count()
setup_s = time.monotonic() - t0

t1 = time.monotonic()
done = run_resumable(spark, t, model, {winners!r}, {manifest!r},
                     n_buckets=8, buckets_per_batch=2,
                     salt_partitions={cores})
run_s = time.monotonic() - t1
print(json.dumps({{"mode": mode, "buckets": done, "setup_s": round(setup_s, 1),
                   "run_s": round(run_s, 1)}}), flush=True)
if mode in ("ref", "resume"):
    rows = sorted(tuple(r) for r in finalize_triples(spark, {winners!r}).collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode()); h.update(b"\\n")
    print(json.dumps({{"mode": mode, "n_triples": len(rows),
                       "hash": h.hexdigest()[:16]}}), flush=True)
"""


def run_child(mode: str, replicas: int, cores: int, winners: str, manifest: str,
              kill_after_batches: int | None = None, kill_extra: float = 0.0):
    code = CHILD.format(root=str(ROOT), mode=mode, cores=cores, replicas=replicas,
                        winners=winners, manifest=manifest)
    t0 = time.monotonic()
    proc = subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    if kill_after_batches is None:
        out, _ = proc.communicate()
        return time.monotonic() - t0, out, None
    # poll the manifest dir until >= kill_after_batches batches are
    # committed (each batch appends parquet part files), then SIGKILL
    # after a randomized-ish extra delay so the kill lands mid-batch
    mdir = Path(manifest)
    while proc.poll() is None:
        time.sleep(0.5)
        n_commits = len(list(mdir.glob("part-*"))) if mdir.exists() else 0
        if n_commits >= kill_after_batches:
            time.sleep(kill_extra)
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            return time.monotonic() - t0, "", "killed"
    out, _ = proc.communicate()
    return time.monotonic() - t0, out, "exited-before-kill"


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    kill_extra = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    import tempfile

    with tempfile.TemporaryDirectory(prefix="resume_torture_") as td:
        ref_w, vic_w = f"{td}/ref_winners", f"{td}/vic_winners"
        ref_m, vic_m = f"{td}/ref_manifest", f"{td}/vic_manifest"

        wall_ref, out_ref, _ = run_child("ref", replicas, cores, ref_w, ref_m)
        print(out_ref.strip(), flush=True)
        wall_vic, _, st = run_child("victim", replicas, cores, vic_w, vic_m,
                                    kill_after_batches=1, kill_extra=kill_extra)
        print(json.dumps({"mode": "victim", "status": st,
                          "wall_until_kill_s": round(wall_vic, 1)}), flush=True)
        wall_res, out_res, _ = run_child("resume", replicas, cores, vic_w, vic_m)
        print(out_res.strip(), flush=True)

        def grab(out: str, key: str):
            for line in out.splitlines():
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if key in d:
                    return d[key]
            return None

        h_ref, h_res = grab(out_ref, "hash"), grab(out_res, "hash")
        n_ref, n_res = grab(out_ref, "n_triples"), grab(out_res, "n_triples")
        verdict = {
            "identical": bool(h_ref and h_ref == h_res and n_ref == n_res),
            "ref_wall_s": round(wall_ref, 1),
            "victim_wall_until_kill_s": round(wall_vic, 1),
            "resume_wall_s": round(wall_res, 1),
            "overhead_s": round(wall_vic + wall_res - wall_ref, 1),
            "hash_ref": h_ref, "hash_resumed": h_res,
            "n_triples": n_ref,
        }
        print(json.dumps(verdict), flush=True)
        return 0 if verdict["identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
