"""Skew torture (VERDICT r03 item 6): measure the extraction stage at
10M+ turns with a planted hot conversation (~20% of ALL turns in one
conv_id), comparing

  naive   — input repartitioned BY conv_id (the layout a conv-keyed
            upstream stage would hand over): the hot key pins ~20% of
            the corpus to ONE task;
  salted  — operators/skew.salt_repartition, width decided by
            suggest_salt_partitions from the data (X2).

Reports wall time per layout, the per-partition row distribution
(max/median — the straggler ratio the salt exists to kill), and the
suggest_salt_partitions decision.  Mentions counts must match.

Usage:
    python tools/skew_torture.py [replicas] [cores]
    # replicas=2000 → 10M turns (documents(sf0.1)=5k docs × 200 turns
    # per replica... see data/derive.py), cores default 16
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def partition_histogram(df):
    from pyspark.sql import functions as F

    rows = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    counts = sorted(r["c"] for r in rows)
    med = counts[len(counts) // 2] if counts else 0
    return {"n_parts": len(counts), "max": counts[-1] if counts else 0, "median": med}


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from lnex_spark.data import fixtures as FX
    from lnex_spark.data.derive import transcripts_from_documents
    from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
    from lnex_spark.operators.extract import extract_mentions_df
    from lnex_spark.operators.skew import salt_repartition, suggest_salt_partitions
    from lnex_spark.pipeline import build_gazetteer
    from lnex_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    t = transcripts_from_documents(docs, replicas=replicas).select(
        "conv_id", "turn_idx", "text"
    )

    gaz = spark.createDataFrame(FX.gen_gazetteer("chennai"), GAZETTEER_SCHEMA)
    stop = spark.createDataFrame([(w,) for w in FX.gen_stopwords()], "word string")
    wl = spark.createDataFrame(FX.gen_wordlist(), "word string, freq long")
    model = build_gazetteer(spark, gaz, stop, wl)
    model.variants.count()

    # materialize the two layouts up front so timing isolates extraction
    naive = t.repartition(cores, "conv_id").persist()
    n_turns = naive.count()
    hot = (
        naive.groupBy("conv_id").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c")).limit(1).collect()[0]
    )
    print(f"turns={n_turns} hot_conv={hot['conv_id']} hot_share={hot['c']/n_turns:.3f}")
    print("naive partition histogram:", partition_histogram(naive))

    width = suggest_salt_partitions(t, cores)
    print(f"suggest_salt_partitions({cores}) -> {width}")
    salted = salt_repartition(t, width or cores).persist()
    salted.count()
    print("salted partition histogram:", partition_histogram(salted))

    def run(df, label):
        t0 = time.time()
        n = extract_mentions_df(df, model.bc_struct).count()
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s  mentions={n}")
        return n, dt

    n1, t_naive = run(naive, "extract over conv_id-partitioned (skew-naive)")
    n2, t_salt = run(salted, "extract over salt_repartition       (salted)")
    assert n1 == n2
    print(f"straggler speedup from salting: {t_naive / t_salt:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
