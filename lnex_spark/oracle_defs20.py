"""Twentieth oracle-registry module: dimension-history maintenance
and the Datasketches aggregate family.

  * scd2_user_status — Slowly-Changing-Dimension type 2: compress the
    event stream into per-user status history rows
    (status, valid_from, valid_to, is_current). Change detection is
    `lag()` over a fully-specified ordering (ts, event_id — so equal
    timestamps cannot flip rows between engines), interval closing is
    `lead()`. The identical SQL text runs on both engines. This is
    the canonical incremental-dimension shape a KG/warehouse batch
    job maintains; at scale it is one keyed window (user-partitioned,
    no global sort).
  * hll_union_users — mergeability of HLL sketches: per-type
    sketches of user_id are `hll_union_agg`ed and both the merged and
    the single global sketch must land within 5% of the exact
    distinct (the union gadget may leave registers in a slightly
    different state than one-pass sketching — measured 1488 vs 1494
    on 1500 — so tolerance, not equality, is the real invariant; the
    merge being *order*-independent is what makes per-partition
    sketching + final union correct at 1000 executors). The estimate
    value is Datasketches-specific, so the oracle checks the exact
    count and the two tolerance booleans, not the estimate.
  * theta_users_setops — theta sketches support set algebra HLL
    cannot (intersection / difference). The op restricts to < 4096
    distinct users so the default lg_k=12 sketch stays in exact mode:
    estimates are then exact integers and the oracle compares them
    against true COUNT(DISTINCT) set-op counts directly — no
    tolerance smuggling.
  * approx_topk_types — `approx_top_k` with k ≥ the true cardinality
    degenerates to exact top-k (its guarantee), so the exploded
    (item, count) rows equal the plain GROUP BY — pinning both the
    function surface and the exactness condition under which a
    100 TB heavy-hitters pass can skip the second exact job.

At 100 TB: SCD2 is one shuffle on the entity key; every sketch agg
here is partial+final with constant-size state (the entire point of
sketches — bytes per group, not rows), and order-independent union-merge
is the property that lets per-partition sketches ship to one reducer.

Reference parity note: LNEx has no aggregate layer [SURVEY.md §0];
these evidence §2B "Aggregations" on the host engine, sketch-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SCD2_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id % 17 = 0
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           event_type AS status,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BOOLEAN) AS is_current
    FROM changes
"""


@register("scd2_user_status", _SCD2_SQL)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_SCD2_SQL)


@register(
    "hll_union_users",
    """
    SELECT count(DISTINCT user_id) AS n_exact,
           TRUE AS union_within_tol,
           TRUE AS global_within_tol
    FROM events
    """,
)
def hll_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-type sketches and the single global sketch must
    each estimate within 5% of exact — the invariants become TRUE
    columns the oracle mirrors."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH per_type AS (
          SELECT event_type, hll_sketch_agg(user_id) AS s
          FROM events GROUP BY event_type
        ),
        u AS (SELECT hll_sketch_estimate(hll_union_agg(s)) AS est_u FROM per_type),
        g AS (SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) AS est_g,
                     count(DISTINCT user_id) AS n_exact
              FROM events)
        SELECT g.n_exact AS n_exact,
               abs(u.est_u - g.n_exact) <= 0.05 * g.n_exact AS union_within_tol,
               abs(g.est_g - g.n_exact) <= 0.05 * g.n_exact AS global_within_tol
        FROM u, g
        """
    )


@register(
    "theta_users_setops",
    """
    WITH c AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND user_id % 23 = 0),
         v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view' AND user_id % 23 = 0)
    SELECT (SELECT count(*) FROM c JOIN v USING (user_id)) AS n_both,
           (SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM v)) AS n_click_only
    """,
)
def theta_users_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection/difference in exact mode (< 4096
    uniques at lg_k=12): the estimates ARE the true set-op counts, so
    the oracle is plain distinct-join arithmetic."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH c AS (SELECT theta_sketch_agg(user_id) AS s FROM events
                   WHERE event_type = 'click' AND user_id % 23 = 0),
             v AS (SELECT theta_sketch_agg(user_id) AS s FROM events
                   WHERE event_type = 'view' AND user_id % 23 = 0)
        SELECT CAST(round(theta_sketch_estimate(theta_intersection(c.s, v.s))) AS BIGINT) AS n_both,
               CAST(round(theta_sketch_estimate(theta_difference(c.s, v.s))) AS BIGINT) AS n_click_only
        FROM c, v
        """
    )


@register(
    "approx_topk_types",
    """
    SELECT event_type AS item, count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def approx_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k (=32) exceeds the true event_type cardinality, so the sketch
    is exact by its own guarantee and explodes to the GROUP BY rows."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT t.item AS item, t.count AS cnt
        FROM (SELECT explode(approx_top_k(event_type, 32)) AS t FROM events)
        """
    )
