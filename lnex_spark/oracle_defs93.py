"""Ninety-third oracle-registry module: counterfactual policy
evaluation and hierarchical integrity hashing.

  * ips_policy_eval_events — inverse-propensity-score off-policy
    evaluation: the logged "behavior policy" is the empirical
    event-type mix; the target policy deterministically plays one
    type per user segment (segment = user_id % 2 → 'view'/'click').
    IPS estimate = mean of 1{logged action = target action}/p̂(action)
    × reward(value), reported next to the on-policy mean and the
    effective sample size Σw²-based diagnostic that says whether the
    estimate is trustworthy.  The counterfactual-readout primitive
    behind "what would metric X be under policy Y" — no new
    experiment needed, exact empirical propensities.

  * merkle_day_hashes_events — order-SENSITIVE hierarchical
    integrity: per-day md5 over the ordered event-id stream
    (ordered string_agg), then a corpus root hash over the ordered
    day hashes.  The Merkle-style complement of the
    order-insensitive table_checksum_orders: two sites compare the
    root, then drill into the one day whose leaf differs — log-cost
    reconciliation instead of full-table diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_IPS_SQL = """
    WITH prop AS (
      SELECT event_type, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events) AS p
      FROM events GROUP BY event_type
    ),
    base AS (
      SELECT e.event_type, e.value, p.p,
             CASE WHEN e.user_id % 2 = 0 THEN 'view' ELSE 'click' END AS target_action
      FROM events e JOIN prop p ON e.event_type = p.event_type
    ),
    weighted AS (
      SELECT value,
             CASE WHEN event_type = target_action THEN 1.0 / p ELSE 0.0 END AS w
      FROM base
    )
    SELECT COUNT(*) AS n_logged,
           ROUND(AVG(value), 6) AS on_policy_mean,
           ROUND(AVG(w * value), 6) AS ips_estimate,
           ROUND(SUM(w) * SUM(w) / NULLIF(SUM(w * w), 0), 6) AS effective_n
    FROM weighted
"""


@register("ips_policy_eval_events", _IPS_SQL)
def ips_policy_eval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tot = ev.agg(F.count("*").alias("n_all"))
    prop = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .crossJoin(tot)
        .select("event_type", (F.col("c") * 1.0 / F.col("n_all")).alias("p"))
    )
    base = ev.join(prop, "event_type").select(
        "event_type",
        "value",
        "p",
        F.when(F.col("user_id") % 2 == 0, "view").otherwise("click").alias(
            "target_action"
        ),
    )
    weighted = base.select(
        "value",
        F.when(F.col("event_type") == F.col("target_action"), 1.0 / F.col("p"))
        .otherwise(0.0)
        .alias("w"),
    )
    return weighted.agg(
        F.count("*").alias("n_logged"),
        F.round(F.avg("value"), 6).alias("on_policy_mean"),
        F.round(F.avg(F.col("w") * F.col("value")), 6).alias("ips_estimate"),
        F.round(
            F.sum("w") * F.sum("w") / F.nullif(F.sum(F.col("w") * F.col("w")), F.lit(0.0)),
            6,
        ).alias("effective_n"),
    )


_MERKLE_SQL = """
    WITH leaves AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id))
               AS leaf_hash,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    root AS (
      SELECT md5(string_agg(leaf_hash, ',' ORDER BY day)) AS root_hash FROM leaves
    )
    SELECT l.day, l.n_events, l.leaf_hash, r.root_hash
    FROM leaves l, root r
"""


@register("merkle_day_hashes_events", _MERKLE_SQL)
def merkle_day_hashes_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # ordered string_agg via sorted collect (array_sort of longs then join)
    leaves = (
        ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col("event_id"))),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("leaf_hash"),
        )
    )
    root = leaves.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("day"), F.col("leaf_hash")))
                    ),
                    lambda s: s.getField("leaf_hash"),
                ),
                ",",
            )
        ).alias("root_hash")
    )
    return leaves.crossJoin(root).select(
        "day", "n_events", "leaf_hash", "root_hash"
    )
