"""Thirteenth oracle-registry module: event-analytics suite — the
product-analytics queries that run next to a KG/training pipeline on
the same event stream.

  * zscore_outliers_events — per-type z-score anomaly flagging (the
    alerting twin of the chi2/KS drift ops in oracle_defs7);
  * funnel_conversion_events — strictly-ordered view→click→purchase
    funnel per user (min-timestamp chaining, not mere presence);
  * retention_cohorts_events — first-seen-day cohorts x day-offset
    retention counts (the self-join-on-user shape);
  * ewma_values_events — exponentially weighted moving average as a
    closed-form windowed sum (sum of v_i · a(1-a)^(n-i) over the
    prefix divided by the same weights' sum — the recursive EWMA
    definition rewritten as two window sums so it stays relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- per-type z-score outliers -------------------------------------------
@register(
    "zscore_outliers_events",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sd, 6) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sd) > 2.5
    """,
)
def zscore_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


# --- strictly-ordered funnel ----------------------------------------------
@register(
    "funnel_conversion_events",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: a step counts only if it happens strictly AFTER
    the user's earliest previous step — min-timestamp chaining, the
    semantics 'presence of all three events' gets wrong."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


# --- first-seen cohorts x day-offset retention ---------------------------
@register(
    "retention_cohorts_events",
    """
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ),
    activity AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
    SELECT f.cohort, datediff('day', f.cohort, a.day) AS day_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    WHERE datediff('day', f.cohort, a.day) <= 7
    GROUP BY 1, 2
    """,
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    off = F.datediff("day", "cohort")
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .filter(off <= 7)
        .groupBy("cohort", off.alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# --- EWMA as closed-form window sums --------------------------------------
@register(
    "ewma_values_events",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER w AS rn
      FROM events WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round(
             sum(value * pow(0.8, -rn)) OVER w2 / sum(pow(0.8, -rn)) OVER w2,
           6) AS ewma
    FROM o
    WINDOW w2 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ewma_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(α=0.2): the recursion ewma_n = α·v_n + (1-α)·ewma_{n-1}
    in closed form — prefix sums of v_i·(1-α)^(-i) normalized by the
    same weights, so it runs as two running-window sums instead of a
    sequential loop. (1-α)^(-i) grows with i, which keeps the ratio
    numerically exact for the short per-user series here; long series
    would re-base the exponent per partition."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wgt = F.pow(F.lit(0.8), -F.col("rn"))
    return o.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value") * wgt).over(w2) / F.sum(wgt).over(w2), 6).alias("ewma"),
    )


# --- grouping_id over ROLLUP ---------------------------------------------
@register(
    "grouping_id_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS prio,
           grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping()-derived level ids — the aggregation-level
    discriminator a report needs to tell subtotal rows from data rows
    (NULL-valued keys alone are ambiguous when the data itself has
    NULLs)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            "gid",
            "n",
            "revenue",
        )
    )


# --- string-function scalar coverage --------------------------------------
@register(
    "string_funcs_parts",
    """
    SELECT p_partkey,
           reverse(p_name) AS rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           repeat(p_brand, 2) AS doubled,
           translate(p_name, 'aeiou', '     ') AS devoweled,
           instr(p_name, ' ') AS first_space,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3
    FROM part WHERE p_partkey < 300
    """,
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.translate("p_name", "aeiou", "     ").alias("devoweled"),
        F.instr("p_name", " ").alias("first_space"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.substring(F.col("p_name"), -3, 3).alias("r3"),
    )


# --- array set operations ---------------------------------------------------
@register(
    "array_setops_docs",
    r"""
    WITH pairs AS (
      SELECT a.doc_id,
             list_distinct(string_split_regex(lower(trim(a.text)), '\s+')) AS ta,
             list_distinct(string_split_regex(lower(trim(b.text)), '\s+')) AS tb
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id < 100
    )
    SELECT doc_id,
           list_sort(list_intersect(ta, tb)) AS common,
           len(list_intersect(ta, tb)) AS n_common,
           len(list_filter(ta, t -> NOT list_contains(tb, t))) AS n_only_a
    FROM pairs
    """,
)
def array_setops_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/except over adjacent-doc token sets — the
    columnar form of pairwise overlap (vs the exploded-join form the
    dedup ops use): no explode, no shuffle, pure codegen per row."""
    d = _t(spark, sf_dir, "documents")
    toks = lambda c: F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).where(
        F.col("a.doc_id") < 100
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        toks(F.col("a.text")).alias("ta"),
        toks(F.col("b.text")).alias("tb"),
    )
    inter = F.array_intersect("ta", "tb")
    return pairs.select(
        "doc_id",
        F.array_sort(inter).alias("common"),
        F.size(inter).alias("n_common"),
        F.size(F.array_except("ta", "tb")).alias("n_only_a"),
    )


# --- quantile-boundary feature binning -------------------------------------
@register(
    "quantile_binning_orders",
    """
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice < b.q1 THEN 'q1'
                WHEN o_totalprice < b.q2 THEN 'q2'
                WHEN o_totalprice < b.q3 THEN 'q3'
                ELSE 'q4' END AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders CROSS JOIN b
    GROUP BY 1
    """,
)
def quantile_binning_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature binning: exact interpolated quartile boundaries
    computed once (1-row broadcast), then a pure CASE projection bins
    every row — the standard numeric-feature bucketizer, with the
    boundary table broadcast instead of QuantileDiscretizer's
    approximate sketch so the DuckDB oracle can agree exactly."""
    o = _t(spark, sf_dir, "orders")
    b = o.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    bin_ = (
        F.when(F.col("o_totalprice") < F.col("q1"), "q1")
        .when(F.col("o_totalprice") < F.col("q2"), "q2")
        .when(F.col("o_totalprice") < F.col("q3"), "q3")
        .otherwise("q4")
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
