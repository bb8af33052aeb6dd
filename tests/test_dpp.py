"""Dynamic partition pruning (DPP) over the partitioned triple tables.

At 100 TB the KG triple tables are written partitioned (K2 writes by
region / conv bucket — sources/tableformat.py). A dimensional query
("triples for the regions matching <filter>") must NOT scan every
partition: Catalyst's DPP injects the dim-side join keys as a runtime
partition filter into the fact scan. This test pins that behavior on
this engine's write layout so a regression (e.g., a partition column
written lower-cased, or a non-deterministic dim filter) can't silently
turn a pruned scan into a full-table scan.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_dpp_prunes_fact_scan(spark, tmp_path):
    fact_path = str(tmp_path / "fact_orders")
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("region_id"),
        (F.col("id") * 3 % 1000).cast("double").alias("amount"),
    )
    orders.write.partitionBy("region_id").parquet(fact_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(i, f"region_{i}", "hot" if i < 2 else "cold") for i in range(7)],
        "region_id long, name string, tier string",
    )

    joined = fact.join(dim, "region_id").where(F.col("tier") == "hot")
    plan = _formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan

    rows = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    got = {r.region_id: r.n for r in rows}
    # ids 0..4999, id % 7: regions 0..4 get 715, 5..6 get 714 — but only
    # hot regions (0, 1) survive the dim filter
    assert got == {0: 715, 1: 715}


def test_dpp_matches_unpartitioned_result(spark, tmp_path):
    """Pruned and unpruned layouts must agree (DPP is a pure optimization)."""
    part_path = str(tmp_path / "part")
    flat_path = str(tmp_path / "flat")
    df = spark.range(0, 3000).select(
        F.col("id"), (F.col("id") % 5).alias("k"), (F.col("id") % 13).alias("v")
    )
    df.write.partitionBy("k").parquet(part_path)
    df.write.parquet(flat_path)

    dim = spark.createDataFrame([(0, True), (1, True), (2, False), (3, False), (4, False)], "k long, keep boolean")

    def run(path):
        f = spark.read.parquet(path)
        return sorted(
            f.join(dim, "k").where("keep").groupBy("k").agg(F.sum("v").alias("sv")).collect()
        )

    assert run(part_path) == run(flat_path)
