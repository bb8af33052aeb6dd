"""Bucketing: co-located joins without a shuffle.

The SURVEY's scale story claims big-big joins (triples ⋈ triples,
mentions ⋈ transcripts) should be bucketed so repeated joins on the
same key pay zero Exchange. This test proves the mechanism locally:
the same join over bucketed tables plans with NO Exchange, while the
plain-parquet twin shuffles both sides."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse_tables(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    wh = tmp_path_factory.mktemp("wh")
    rows = spark.range(0, 2000).select(
        F.concat(F.lit("c"), (F.col("id") % 300)).alias("subj"),
        F.lit("mentionsLocation").alias("pred"),
        (F.col("id") % 17).alias("obj"),
    )
    attrs = spark.range(0, 300).select(
        F.concat(F.lit("c"), F.col("id")).alias("subj"),
        (F.col("id") % 5).alias("grp"),
    )
    # spark.sql.warehouse.dir is a static conf — give every table an
    # explicit tmp path instead (external tables, in-memory catalog)
    for name, df in [("t_mentions", rows), ("t_attrs", attrs)]:
        (
            df.write.bucketBy(8, "subj")
            .sortBy("subj")
            .option("path", str(wh / f"{name}_bucketed"))
            .mode("overwrite")
            .saveAsTable(f"{name}_bucketed")
        )
        df.write.option("path", str(wh / f"{name}_plain")).mode(
            "overwrite"
        ).saveAsTable(f"{name}_plain")
    yield spark
    for name in ("t_mentions", "t_attrs"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")
        spark.sql(f"DROP TABLE IF EXISTS {name}_plain")


def _join_plan(spark, suffix: str) -> str:
    a = spark.table(f"t_mentions_{suffix}")
    b = spark.table(f"t_attrs_{suffix}")
    joined = a.join(b, "subj").groupBy("grp").count()
    return joined._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(warehouse_tables):
    spark = warehouse_tables
    # disable auto-broadcast so the join strategy is the bucketed SMJ,
    # not a broadcast that would hide the shuffle question entirely
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = _join_plan(spark, "bucketed")
        plain = _join_plan(spark, "plain")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # bucketed: the join itself needs no Exchange; only the final
    # groupBy('grp') re-keys (1 exchange). plain: both join sides
    # shuffle too (3 exchanges).
    assert "SortMergeJoin" in bucketed and "SortMergeJoin" in plain
    assert bucketed.count("Exchange hashpartitioning") == 1
    assert plain.count("Exchange hashpartitioning") == 3


def test_bucketed_and_plain_agree(warehouse_tables):
    spark = warehouse_tables
    b = sorted(
        map(
            tuple,
            spark.table("t_mentions_bucketed")
            .join(spark.table("t_attrs_bucketed"), "subj")
            .groupBy("grp")
            .count()
            .collect(),
        )
    )
    p = sorted(
        map(
            tuple,
            spark.table("t_mentions_plain")
            .join(spark.table("t_attrs_plain"), "subj")
            .groupBy("grp")
            .count()
            .collect(),
        )
    )
    assert b == p and len(b) == 5
