"""Time-series regularization: resample an irregular event stream
onto a fixed grid and forward-fill the gaps.

Not in the reference (LNEx ignores time — SURVEY.md §2B); this is the
temporal-normalization step a transcript/metrics pipeline runs before
rate math, drift windows, or model features that assume equal
spacing.

Scale shape (per op): one keyed hash agg (hour buckets), a GENERATED
per-key spine (sequence + explode — bounded by span/granularity, no
shuffle to build), one co-partitioned left join, and one keyed window
for the fill.  Nothing global: every step is partitioned by the
entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_hourly_locf(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, h, v_filled): per-key dense hourly grid from the key's
    first to last observed hour; hours with no events carry the last
    observed hourly sum forward (LOCF).  The first spine hour always
    has data by construction (the spine starts at min(ts)'s hour), so
    the fill never emits leading nulls."""
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = events.groupBy(F.col(key), hour.alias("h")).agg(
        F.sum(value_col).alias("v")
    )
    span = events.groupBy(key).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("h1"),
    )
    spine = span.select(
        key,
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    j = spine.join(agg, [key, "h"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key,
        "h",
        F.round(F.last("v", ignorenulls=True).over(w), 6).alias("v_filled"),
    )
