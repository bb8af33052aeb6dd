"""Heavy/light skew-join decomposition.

AQE's skew-join splitting (pinned in tests/test_runtime_opts.py)
handles sort-merge joins at runtime; the MANUAL decomposition below is
the plan-level alternative a 100 TB job uses when it knows its hot
keys up front: route the heavy keys through a broadcast join (no
shuffle of the giant side's hot partitions) and the long tail through
the ordinary shuffle join, then union.

The test proves the decomposition is RESULT-IDENTICAL to the plain
join on a deliberately skewed dataset and asserts the heavy leg's
plan actually broadcasts.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_frames(spark):
    # fact: one hot key (0) carrying half the rows + a long tail
    hot = spark.range(0, 500).select(
        F.lit(0).alias("k"), (F.col("id") * 2).alias("v")
    )
    tail = spark.range(1, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    fact = hot.unionByName(tail)
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_split_join_equals_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "v", "label")

    # heavy keys discovered from a (cheap, aggregated) histogram
    heavy_keys = [
        r["k"]
        for r in fact.groupBy("k").count().filter(F.col("count") > 100).collect()
    ]
    assert heavy_keys == [0]

    heavy = (
        fact.filter(F.col("k").isin(heavy_keys))
        .join(F.broadcast(dim.filter(F.col("k").isin(heavy_keys))), "k")
        .select("k", "v", "label")
    )
    light = (
        fact.filter(~F.col("k").isin(heavy_keys))
        .join(dim.filter(~F.col("k").isin(heavy_keys)), "k")
        .select("k", "v", "label")
    )
    split = heavy.unionByName(light)

    assert "BroadcastHashJoin" in heavy._jdf.queryExecution().executedPlan().toString()
    a = sorted(plain.collect())
    b = sorted(split.collect())
    assert a == b and len(a) == 999
