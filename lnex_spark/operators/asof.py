"""As-of (backward) join — "for each left row, the most recent right
row at or before it, per key".

Not present in the reference (LNEx ignores time); first-class here
because transcript/KG pipelines constantly need it (latest tool state
at each turn, last error before a click, slowly-changing gazetteer
versions).

Scale design: the naive formulation is a range theta-join (left.ts >=
right.ts) whose candidate space explodes quadratically per key. The
idiomatic Spark plan used here is UNION + WINDOW:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, side, tiebreak)
      -> last non-null right payload at each left row

One shuffle keyed by the join key (same as any keyed join), no
range-explosion, no skew beyond the key's own distribution, and the
window is a single pass — this survives a 100x scale-up where a
range join would not. AQE skew-join does not apply to windows, so the
key distribution itself is the only hot-spot concern (same story as
T1 turn ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every ``left`` row, attach ``value_cols`` from the latest
    ``right`` row with ``right.ts <= left.ts`` (equal ts matches), per
    ``on`` key. Right rows with duplicate (key, ts) must be pre-deduped
    by the caller for determinism.

    Returns all left columns + ``{prefix}{c}`` for each value col
    (null when no right row precedes).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != ts_col]

    payload = F.struct(*[F.col(c) for c in value_cols])
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.select(payload).schema[0].dataType).alias("_payload"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    # align schemas: left columns missing on the right become nulls
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(*l_tagged.columns)

    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_payload", ignorenulls=True).over(w)
    out = u.withColumn("_carried", carried).filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("_carried").getField(c))
    return out.drop("_side", "_payload", "_carried")
