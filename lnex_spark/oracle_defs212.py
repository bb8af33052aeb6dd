"""Two-hundred-twelfth oracle-registry module: physical-plan cost
models AS data — the partition-count and broadcast decisions a
100 TB job must get right, computed from the data's own shape.

  * partition_cost_model_events — shuffle-partition makespan model
    for a groupBy(user_id) at parallelism P in {2,4,...,64}: per-key
    weight = event count (the bytes proxy), theoretical makespan
    lower bound = max(total/P, heaviest key) — a single key can cap
    scaling no matter how many partitions you buy (the exact reason
    the flagship salts conv_id).  Emits per P the bound, the
    parallel efficiency total/(P * bound), and the marginal speedup
    vs P/2; read off where efficiency collapses: that's the
    straggler wall, and its height IS the max-key share.

  * broadcast_plan_tables — broadcast-join eligibility sheet for the
    five dimension tables (region, nation, customer, supplier,
    part): estimated in-memory bytes = 16 per numeric column + 20 +
    actual string lengths (measured, not guessed), with
    verdicts at the 8 MB / 64 MB thresholds.  The sheet behind
    every `F.broadcast` in this repo: nation/region always fit;
    customer/part flip between SF 0.1 and planet scale — exactly
    the broadcast-to-shuffle cliff AQE renegotiates at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PCM_SQL = """
    WITH keys AS (
      SELECT user_id, COUNT(*) AS w FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT SUM(w) AS total, MAX(w) AS mx, COUNT(*) AS nk FROM keys
    ),
    ps AS (SELECT UNNEST([2, 4, 8, 16, 32, 64]) AS p),
    model AS (
      SELECT p.p,
             GREATEST(CAST(t.total AS DOUBLE) / p.p, t.mx) AS bound,
             t.total, t.mx, t.nk
      FROM ps p CROSS JOIN tot t
    )
    SELECT p AS partitions,
           ROUND(bound, 2) AS makespan_bound,
           ROUND(total / (p * bound), 6) AS efficiency,
           ROUND(CAST(mx AS DOUBLE) / total, 6) AS max_key_share,
           CAST(nk AS BIGINT) AS n_keys
    FROM model
    ORDER BY partitions
"""


@register("partition_cost_model_events", _PCM_SQL)
def partition_cost_model_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    keys = ev.groupBy("user_id").agg(F.count("*").alias("w"))
    tot = keys.agg(
        F.sum("w").alias("total"),
        F.max("w").alias("mx"),
        F.count("*").alias("nk"),
    )
    ps = ev.sparkSession.createDataFrame(
        [(2,), (4,), (8,), (16,), (32,), (64,)], "p int"
    )
    model = F.broadcast(ps).crossJoin(tot).select(
        "p",
        F.greatest(
            F.col("total").cast("double") / F.col("p"), F.col("mx")
        ).alias("bound"),
        "total",
        "mx",
        "nk",
    )
    return model.select(
        F.col("p").alias("partitions"),
        F.round("bound", 2).alias("makespan_bound"),
        F.round(F.col("total") / (F.col("p") * F.col("bound")), 6).alias(
            "efficiency"
        ),
        F.round(F.col("mx").cast("double") / F.col("total"), 6).alias(
            "max_key_share"
        ),
        F.col("nk").cast("long").alias("n_keys"),
    ).orderBy("partitions")


_BCAST_SQL = """
    WITH sizes AS (
      SELECT 'region' AS tbl, COUNT(*) AS n,
             SUM(16 * 1 + 20 + LENGTH(r_name)) AS b
      FROM region
      UNION ALL
      SELECT 'nation', COUNT(*),
             SUM(16 * 2 + 20 + LENGTH(n_name))
      FROM nation
      UNION ALL
      SELECT 'customer', COUNT(*),
             SUM(16 * 3 + 20 + LENGTH(c_name) + LENGTH(c_mktsegment))
      FROM customer
      UNION ALL
      SELECT 'supplier', COUNT(*),
             SUM(16 * 3 + 20 + LENGTH(s_name))
      FROM supplier
      UNION ALL
      SELECT 'part', COUNT(*),
             SUM(16 * 3 + 20 + LENGTH(p_name) + LENGTH(p_brand)
                 + LENGTH(p_type))
      FROM part
    )
    SELECT tbl AS table_name,
           CAST(n AS BIGINT) AS n_rows,
           CAST(b AS BIGINT) AS est_bytes,
           CASE WHEN b <= 8 * 1024 * 1024 THEN 1 ELSE 0 END
             AS fits_8mb,
           CASE WHEN b <= 64 * 1024 * 1024 THEN 1 ELSE 0 END
             AS fits_64mb
    FROM sizes
    ORDER BY table_name
"""


@register("broadcast_plan_tables", _BCAST_SQL)
def broadcast_plan_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    specs = [
        ("region", 1, ["r_name"]),
        ("nation", 2, ["n_name"]),
        ("customer", 3, ["c_name", "c_mktsegment"]),
        ("supplier", 3, ["s_name"]),
        ("part", 3, ["p_name", "p_brand", "p_type"]),
    ]
    frames = []
    for tbl, nnum, strcols in specs:
        df = _t(spark, sf_dir, tbl)
        strlen = None
        for c in strcols:
            term = F.length(c)
            strlen = term if strlen is None else strlen + term
        frames.append(
            df.agg(
                F.lit(tbl).alias("tbl"),
                F.count("*").alias("n"),
                F.sum(16 * nnum + 20 + strlen).alias("b"),
            )
        )
    sizes = frames[0]
    for f in frames[1:]:
        sizes = sizes.unionByName(f)
    return sizes.select(
        F.col("tbl").alias("table_name"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("b").cast("long").alias("est_bytes"),
        F.when(F.col("b") <= 8 * 1024 * 1024, 1).otherwise(0).alias(
            "fits_8mb"
        ),
        F.when(F.col("b") <= 64 * 1024 * 1024, 1).otherwise(0).alias(
            "fits_64mb"
        ),
    ).orderBy("table_name")
