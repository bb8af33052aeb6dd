"""Distributed global rank / running sum — the 100 TB replacement for
``Window.orderBy(...)`` with no partition spec.

An unpartitioned window forces every row through ONE task (Spark even
warns: "No Partition Defined for Window operation! Moving all data to
a single partition").  Fine over a provably tiny table; a scale-killer
over anything row-proportional.  This module is the engine-wide scale
path, the windowed-rank generalization of
operators/quantiles.bucketed_exact_quantile:

  1. ``repartitionByRange`` on the ordering columns — each partition
     holds one contiguous slice of the global order (RangePartitioner
     assigns ascending ranges to ascending partition ids);
  2. rank / running-sum WITHIN each partition (a partitioned window —
     parallel, spill-safe);
  3. per-partition row counts / value sums (one tiny agg, ≤ n_parts
     rows) prefix-summed with a global window that is bounded by the
     PARTITION COUNT, not the row count, then broadcast back as
     offsets.

The result is value-identical to the single-partition window for any
total ordering (callers must fully specify order, same contract as
before), at the cost of one extra range shuffle — which the global
window needed anyway, except it shuffled to a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__sw_pid"
_INTRA_RN = "__sw_rn"
_INTRA_CS = "__sw_cs"
_ROWS_OFF = "__sw_row_off"
_SUM_OFF = "__sw_sum_off"


def _order_exprs(order: list[Column | str]) -> list[Column]:
    return [F.col(o) if isinstance(o, str) else o for o in order]


def attach_rank(
    df: DataFrame,
    order: list[Column | str],
    rank_col: str = "rn",
    cumsum_of: str | Column | None = None,
    cumsum_col: str = "cum",
    n_parts: int | None = None,
) -> DataFrame:
    """Add a global ``row_number`` (and optionally a global running
    sum of ``cumsum_of``) under ``ORDER BY order`` without ever
    moving the data to a single partition.

    ``order`` must be a total order (include a tie-breaking key) for
    the rank to be deterministic — identical to the contract of the
    unpartitioned-window form this replaces.
    """
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    oe = _order_exprs(order)
    d = df.repartitionByRange(n_parts, *oe).withColumn(_PID, F.spark_partition_id())

    intra = Window.partitionBy(_PID).orderBy(*oe)
    d = d.withColumn(_INTRA_RN, F.row_number().over(intra))
    aggs = [F.count(F.lit(1)).alias("_sw_n")]
    want_sum = cumsum_of is not None
    if want_sum:
        cs_expr = F.col(cumsum_of) if isinstance(cumsum_of, str) else cumsum_of
        d = d.withColumn(
            _INTRA_CS,
            F.sum(cs_expr).over(intra.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        aggs.append(F.sum(cs_expr).alias("_sw_s"))

    # per-partition totals: ≤ n_parts rows — the ONLY global window
    # left runs over this partition-count-bounded table
    sizes = d.groupBy(_PID).agg(*aggs)
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.withColumn(_ROWS_OFF, F.coalesce(F.sum("_sw_n").over(woff), F.lit(0)))
    if want_sum:
        offs = offs.withColumn(_SUM_OFF, F.coalesce(F.sum("_sw_s").over(woff), F.lit(0)))
    offs = offs.drop("_sw_n", "_sw_s")

    out = d.join(F.broadcast(offs), _PID).withColumn(
        rank_col, (F.col(_INTRA_RN) + F.col(_ROWS_OFF)).cast("int")
    )
    if want_sum:
        out = out.withColumn(cumsum_col, F.col(_INTRA_CS) + F.col(_SUM_OFF))
    return out.drop(_PID, _INTRA_RN, _INTRA_CS, _ROWS_OFF, _SUM_OFF)


def attach_running_sum(
    df: DataFrame,
    order: list[Column | str],
    value_col: str | Column,
    out_col: str = "cum",
    n_parts: int | None = None,
) -> DataFrame:
    """Global running total of ``value_col`` under ``ORDER BY order``
    (inclusive of the current row), distributed exactly like
    :func:`attach_rank`."""
    return attach_rank(
        df,
        order,
        rank_col="__sw_drop_rn",
        cumsum_of=value_col,
        cumsum_col=out_col,
        n_parts=n_parts,
    ).drop("__sw_drop_rn")
