"""Fortieth oracle-registry module: nearest-event temporal join and
permutation-invariant bag dedup.

  * nearest_event_join — for each error event, the nearest click by
    the SAME user in either time direction: the bidirectional
    completion of the backward-only as-of join
    (asof_join_clicks_errors).  Built as the union of the backward
    and forward keyed window picks, then a struct-min over (|Δt|,
    direction-stable tiebreak) — no range blowup, two keyed windows.
  * bag_dedup_docs — duplicate groups under the bag-of-words
    fingerprint (md5 over the SORTED token multiset): catches
    token-permuted near-copies that exact-hash dedup misses entirely
    (injected here as reversed-order clones of the first 50 docs —
    different strings, identical bags).  One fingerprint projection +
    one hash agg, the same shape as exact_duplicates one level up
    the invariance ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- bidirectional nearest-event join --------------------------------------
_NEAREST_SQL = """
    WITH u AS (
      SELECT event_id, user_id, event_type, ts FROM events
      WHERE event_type IN ('click', 'error')
    ),
    seq AS (
      SELECT *,
             lag(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_click,
             lead(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_click
      FROM u
    )
    SELECT event_id, user_id,
           CASE
             WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
             WHEN next_click IS NULL THEN
               date_diff('microsecond', prev_click, ts)
             WHEN prev_click IS NULL THEN
               date_diff('microsecond', ts, next_click)
             WHEN date_diff('microsecond', prev_click, ts)
                  <= date_diff('microsecond', ts, next_click) THEN
               date_diff('microsecond', prev_click, ts)
             ELSE date_diff('microsecond', ts, next_click)
           END AS nearest_click_us
    FROM seq WHERE event_type = 'error'
"""


@register("nearest_event_join", _NEAREST_SQL)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest same-user click per error, either direction, as two
    IGNORE-NULLS keyed window picks (last click at-or-before, first
    click after) and a min of the two gaps — ties go backward, like
    the as-of convention.  One shuffle on user_id, no interval
    self-join."""
    u = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_back = w.rowsBetween(Window.unboundedPreceding, -1)
    w_fwd = w.rowsBetween(1, Window.unboundedFollowing)
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    seq = u.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(click_ts, ignorenulls=True).over(w_back).alias("prev_click"),
        F.first(click_ts, ignorenulls=True).over(w_fwd).alias("next_click"),
    )
    us = lambda a, b: F.unix_micros(F.col(b).cast("timestamp")) - F.unix_micros(
        F.col(a).cast("timestamp")
    )
    back = us("prev_click", "ts")
    fwd = us("ts", "next_click")
    nearest = (
        F.when(F.col("prev_click").isNull() & F.col("next_click").isNull(), F.lit(None))
        .when(F.col("next_click").isNull(), back)
        .when(F.col("prev_click").isNull(), fwd)
        .when(back <= fwd, back)
        .otherwise(fwd)
    )
    return seq.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", nearest.alias("nearest_click_us")
    )


# --- bag-of-words (permutation-invariant) dedup ----------------------------
_BAG_SQL = r"""
    WITH uni AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(list_reverse(string_split_regex(text, '\s+')), ' ')
      FROM documents WHERE doc_id < 50
    ),
    fp AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(string_split_regex(lower(trim(text)), '\s+')), ' '))
               AS bag_fp
      FROM uni WHERE len(trim(text)) > 0
    )
    SELECT bag_fp, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM fp GROUP BY bag_fp HAVING count(*) > 1
"""


@register("bag_dedup_docs", _BAG_SQL)
def bag_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rev = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), r"\s+")), " ").alias("text"),
    )
    uni = d.unionByName(rev).filter(F.length(F.trim("text")) > 0)
    fp = uni.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.sort_array(F.split(F.lower(F.trim(F.col("text"))), r"\s+")), " "
            )
        ).alias("bag_fp"),
    )
    return (
        fp.groupBy("bag_fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )
