"""Cost-based optimizer statistics.

At 100 TB the difference between a good and a catastrophic join order
is table/column statistics: ANALYZE TABLE feeds rowCount/size into the
CBO so Catalyst can reorder joins and size broadcasts from data, not
defaults.  This pins that the statistics pipeline works end to end:
ANALYZE populates catalog stats, `explain("cost")` carries rowCount
into the logical plan, and a stats-informed multi-join still returns
the right answer with CBO + join reorder enabled.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_analyze_table_feeds_cbo(spark, tmp_path):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        sf = "/root/testdata/sf0.001"
        spark.read.parquet(f"{sf}/orders.parquet").write.mode("overwrite").saveAsTable(
            "cbo_orders"
        )
        spark.read.parquet(f"{sf}/customer.parquet").write.mode(
            "overwrite"
        ).saveAsTable("cbo_customer")
        spark.read.parquet(f"{sf}/nation.parquet").write.mode("overwrite").saveAsTable(
            "cbo_nation"
        )
        for t in ("cbo_orders", "cbo_customer", "cbo_nation"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")

        # catalog stats recorded
        desc = spark.sql("DESC EXTENDED cbo_orders").collect()
        stats_row = [r for r in desc if r["col_name"] == "Statistics"]
        assert stats_row and "rows" in stats_row[0]["data_type"]

        joined = spark.sql(
            """
            SELECT n.n_name, COUNT(*) AS n_orders, SUM(o.o_totalprice) AS rev
            FROM cbo_orders o
            JOIN cbo_customer c ON o.o_custkey = c.c_custkey
            JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            """
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("cost")
        cost_plan = buf.getvalue()
        # CBO-estimated statistics must appear in the optimized logical plan
        assert "rowCount=" in cost_plan

        got = {r["n_name"]: r["n_orders"] for r in joined.collect()}
        want = (
            spark.read.parquet(f"{sf}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .join(
                spark.read.parquet(f"{sf}/nation.parquet"),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .groupBy("n_name")
            .count()
        )
        want_map = {r["n_name"]: r["count"] for r in want.collect()}
        assert got == want_map
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        for t in ("cbo_orders", "cbo_customer", "cbo_nation"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
