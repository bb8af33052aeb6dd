"""Python UDTF + grouped-agg pandas UDF surfaces (operators/udtfs.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_shingle_udtf_lateral(spark):
    from lnex_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "The quick  brown fox"), (2, "one"), (3, None), (4, "  a  b  ")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.pos, s.shingle FROM udtf_docs d, LATERAL shingle_udtf(d.text) s"
    ).collect()
    got = {(r.doc_id, r.pos, r.shingle) for r in rows}
    assert got == {
        (1, 0, "the quick"),
        (1, 1, "quick brown"),
        (1, 2, "brown fox"),
        (4, 0, "a b"),
    }


def test_gmean_grouped_udf(spark):
    from lnex_spark.operators.udtfs import gmean_udf

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 5.0)], "grp string, v double"
    )
    got = {r.grp: r.g for r in df.groupBy("grp").agg(gmean_udf("v").alias("g")).collect()}
    assert abs(got["a"] - 4.0) < 1e-12  # gmean(2,8)=4
    assert abs(got["b"] - 5.0) < 1e-12
    assert math.isclose(got["a"], math.exp((math.log(2) + math.log(8)) / 2))
