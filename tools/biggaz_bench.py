"""Planet-scale matcher stress (VERDICT r03 item 4): run the
broadcast-free relational matcher (operators/extract_relational) with
a synthetic ~1M-name gazetteer that genuinely exceeds the broadcast
threshold, against the sf0.1 derived transcripts.

Records: gazetteer size, wall time, mention count (must equal the
fixture-gazetteer-only run — the synthetic names are constructed to
never match), and the plan facts that matter at 100 TB: the
gazetteer-side join is NOT a broadcast, and the first-token gate is
skipped past max_start_tokens (pure-join semantics).

Usage:
    python tools/biggaz_bench.py [n_names] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_gazetteer(spark, n_names: int):
    """Deterministic n_names-row gazetteer of 1-3 token names over a
    'zq'-prefixed vocabulary that cannot collide with fixture text
    (no fixture token starts with 'zq')."""
    from pyspark.sql import functions as F

    base = spark.range(n_names)
    tok = lambda salt: F.concat(
        F.lit("zq"), F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 6), 16, 10)
    )
    name = F.when(F.col("id") % 3 == 0, tok("a")).when(
        F.col("id") % 3 == 1, F.concat_ws(" ", tok("a"), tok("b"))
    ).otherwise(F.concat_ws(" ", tok("a"), tok("b"), tok("c")))
    return base.select(name.alias("norm"))


def main() -> int:
    n_names = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from lnex_spark.data import fixtures as FX
    from lnex_spark.data.derive import transcripts_from_documents
    from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
    from lnex_spark.operators.extract_relational import extract_mentions_relational
    from lnex_spark.pipeline import build_gazetteer
    from lnex_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = transcripts_from_documents(docs, replicas=40).select(
        "conv_id", "turn_idx", "text"
    ).persist()
    n_turns = t.count()

    gaz = spark.createDataFrame(FX.gen_gazetteer("chennai"), GAZETTEER_SCHEMA)
    stop = spark.createDataFrame([(w,) for w in FX.gen_stopwords()], "word string")
    wl = spark.createDataFrame(FX.gen_wordlist(), "word string, freq long")
    model = build_gazetteer(spark, gaz, stop, wl)
    fixture_variants = model.variants.select("norm")
    big = synth_gazetteer(spark, n_names)
    variants = fixture_variants.unionByName(big).persist()
    n_var = variants.count()
    print(f"gazetteer: {n_var} names ({n_names} synthetic + fixture)")

    # baseline: fixture-only relational run (same code path)
    t0 = time.time()
    base_mentions = extract_mentions_relational(t, fixture_variants).count()
    t_base = time.time() - t0

    t0 = time.time()
    m = extract_mentions_relational(t, variants)
    n_mentions = m.count()
    t_big = time.time() - t0

    plan = m._jdf.queryExecution().executedPlan().toString()
    has_bcast_gaz = "BroadcastHashJoin" in plan and "norm" in plan.split(
        "BroadcastHashJoin"
    )[-1][:0]
    # the gazetteer-side semi join must not be broadcast: look for the
    # join operator consuming the variants union
    gaz_join_bcast = False
    for seg in plan.split("\n"):
        if "Join" in seg and "LeftSemi" in seg:
            gaz_join_bcast = "Broadcast" in seg
            print("semi-join node:", seg.strip()[:160])
    print(
        f"turns={n_turns} wall_fixture={t_base:.1f}s wall_bigG={t_big:.1f}s "
        f"mentions_fixture={base_mentions} mentions_bigG={n_mentions} "
        f"gazetteer_join_broadcast={gaz_join_bcast}"
    )
    assert n_mentions == base_mentions, "synthetic names must never match"
    assert not gaz_join_bcast, "gazetteer side must not be broadcast"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
