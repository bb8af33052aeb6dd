"""X2 skew evidence: salted repartition measurably balances a hot
conv_id across tasks (row counts per partition — deterministic, no
timing)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark, n_rows=8000, hot_share=0.5):
    hot = int(n_rows * hot_share)
    rows = [("conv_hot", i) for i in range(hot)] + [
        (f"conv_{i % 200}", i) for i in range(n_rows - hot)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int")


def _max_partition_share(df) -> float:
    sizes = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    return max(r["count"] for r in sizes) / total


def test_salting_spreads_hot_key(spark):
    from lnex_spark.operators.skew import salt_repartition

    df = _skewed(spark)
    unsalted = df.repartition(8, F.col("conv_id"))
    salted = salt_repartition(df, 8)
    share_unsalted = _max_partition_share(unsalted)
    share_salted = _max_partition_share(salted)
    # the hot conversation (50% of rows) lands in ONE partition
    # unsalted; salted it spreads to ~uniform (1/8 = 0.125)
    assert share_unsalted >= 0.5
    assert share_salted < 0.25
    assert salted.count() == df.count()  # nothing lost


def test_salting_preserves_rows_exactly(spark):
    from lnex_spark.operators.skew import salt_repartition

    df = _skewed(spark, n_rows=1000)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, salt_repartition(df, 5).collect()))
    assert a == b
