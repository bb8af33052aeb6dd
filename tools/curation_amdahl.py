"""Amdahl decomposition of curate_transcripts (VERDICT r04 item 3).

The 2M-turn curation scaling point reads 0.584 (4→16 cores) while the
30M point passes at 0.807.  The claimed explanation is a fixed
per-JOB cost (stage barriers, AQE planning, sort setup — ~1.5s)
against a 3.4s job, i.e. an Amdahl artifact of the small input, not a
shuffle/skew defect.  This tool PROVES or REFUTES that by fitting

    wall(n_turns) = fixed + slope * n_turns      (least squares)

at several input sizes per pinned parallelism level.  If the claim is
right: ``fixed`` is roughly level-independent and ~1-2s, and the
MARGINAL throughput ratio  (1/slope16) / (4 * 1/slope4)  — the
scaling efficiency of the data-proportional work alone — lands at or
above the measured host ceiling (~0.73-0.8 for string-scan-heavy
jobs on this VM), while the HEADLINE 2M ratio stays depressed exactly
by fixed/wall.  If the residual were shuffle-shaped, slope16 would
degrade with n and the marginal ratio would fall, not rise.

Run pinned, one level per invocation (fresh JVM):
    taskset -c 0-3  python tools/curation_amdahl.py 4
    taskset -c 0-15 python tools/curation_amdahl.py 16
Prints one JSON line per size plus the fit.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# replicas -> ~turns: 100→0.5M, 400→2M, 1200→6M
SIZES = [100, 400, 1200]
REPS = 3


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sizes = [int(s) for s in sys.argv[2:]] or SIZES

    from lnex_spark.data.derive import transcripts_from_documents
    from lnex_spark.operators.curation import curate_transcripts
    from lnex_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]", app_name=f"curation_amdahl_{cores}",
        shuffle_partitions=cores,
    )
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    points = []
    for replicas in sizes:
        t = (
            transcripts_from_documents(docs, replicas=replicas)
            .select("conv_id", "turn_idx", "role", "text")
            .repartition(cores * 2)
            .persist()
        )
        n_turns = t.count()
        best = None
        for _ in range(REPS):
            t0 = time.monotonic()
            curate_transcripts(
                t, shards=256, min_turns=2, len_band=(1.0, 100000.0)
            ).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        t.unpersist()
        points.append((n_turns, best))
        print(json.dumps({"cores": cores, "turns": n_turns,
                          "wall_s": round(best, 3)}), flush=True)

    # least-squares fit wall = fixed + slope * turns
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    fixed = my - slope * mx
    print(
        json.dumps(
            {
                "cores": cores,
                "fit_fixed_s": round(fixed, 3),
                "fit_slope_s_per_mturn": round(slope * 1e6, 4),
                "marginal_turns_per_sec": round(1.0 / slope, 1),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
