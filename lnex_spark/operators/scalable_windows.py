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
    cumsums: list[tuple[str | Column, str]] | None = None,
) -> DataFrame:
    """Add a global ``row_number`` (and optionally global running sums)
    under ``ORDER BY order`` without ever moving the data to a single
    partition.

    ``cumsums`` takes ``[(value_expr, out_col), ...]`` for several
    running totals in ONE pass (one range shuffle, shared offsets
    table); ``cumsum_of``/``cumsum_col`` remain as the single-sum
    shorthand.  ``order`` must be a total order (include a tie-breaking
    key) for the rank to be deterministic — identical to the contract
    of the unpartitioned-window form this replaces.
    """
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    sums = list(cumsums or [])
    if cumsum_of is not None:
        sums.append((cumsum_of, cumsum_col))
    oe = _order_exprs(order)
    d = df.repartitionByRange(n_parts, *oe).withColumn(_PID, F.spark_partition_id())

    intra = Window.partitionBy(_PID).orderBy(*oe)
    run = intra.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn(_INTRA_RN, F.row_number().over(intra))
    aggs = [F.count(F.lit(1)).alias("_sw_n")]
    for i, (expr, _) in enumerate(sums):
        e = F.col(expr) if isinstance(expr, str) else expr
        d = d.withColumn(f"{_INTRA_CS}{i}", F.sum(e).over(run))
        aggs.append(F.sum(e).alias(f"_sw_s{i}"))

    # per-partition totals: ≤ n_parts rows — the ONLY global window
    # left runs over this partition-count-bounded table
    sizes = d.groupBy(_PID).agg(*aggs)
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.withColumn(_ROWS_OFF, F.coalesce(F.sum("_sw_n").over(woff), F.lit(0)))
    drop_tmp = ["_sw_n"]
    for i in range(len(sums)):
        offs = offs.withColumn(
            f"{_SUM_OFF}{i}", F.coalesce(F.sum(f"_sw_s{i}").over(woff), F.lit(0))
        )
        drop_tmp.append(f"_sw_s{i}")
    offs = offs.drop(*drop_tmp)

    out = d.join(F.broadcast(offs), _PID).withColumn(
        rank_col, (F.col(_INTRA_RN) + F.col(_ROWS_OFF)).cast("int")
    )
    dropme = [_PID, _INTRA_RN, _ROWS_OFF]
    for i, (_, name) in enumerate(sums):
        out = out.withColumn(name, F.col(f"{_INTRA_CS}{i}") + F.col(f"{_SUM_OFF}{i}"))
        dropme += [f"{_INTRA_CS}{i}", f"{_SUM_OFF}{i}"]
    return out.drop(*dropme)


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


def attach_rank_ties(
    df: DataFrame,
    order: list[Column | str],
    order_key_cols: list[str],
    rank_col: str = "rk",
    n_parts: int | None = None,
) -> DataFrame:
    """Distributed ``rank()`` (ties share the rank of their first row):
    global row_number, then each distinct ordering key takes the MIN
    row_number over its tie group — a hash agg + equi-join on the
    ordering columns, both parallel, no single-partition stage.

    ``order_key_cols`` must name exactly the columns ``order`` sorts by
    (rank() tie groups are defined by ordering-key equality)."""
    d = attach_rank(df, order, rank_col="__sw_rn_t", n_parts=n_parts)
    firsts = d.groupBy(*order_key_cols).agg(F.min("__sw_rn_t").alias(rank_col))
    return d.join(firsts, order_key_cols).drop("__sw_rn_t")


def attach_shift(
    df: DataFrame,
    order: list[Column | str],
    cols: list[str],
    offset: int = -1,
    suffix: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Distributed ``lag``/``lead`` by |offset| rows under a GLOBAL
    ordering (offset=-1 → lag 1, offset=+2 → lead 2, …): attach the
    distributed row number, then self-equi-join on ``rn == rn+offset``.
    The join shuffles on rn — uniformly distributed by construction, so
    no skew — and both sides prune to (rn, cols).

    New columns are named ``{col}{suffix}`` with suffix defaulting to
    ``_lag{n}`` / ``_lead{n}``; missing neighbors are NULL, matching
    the window form's default."""
    if offset == 0:
        raise ValueError("offset must be nonzero")
    if suffix is None:
        suffix = f"_lag{-offset}" if offset < 0 else f"_lead{offset}"
    d = attach_rank(df, order, rank_col="__sw_rn_s", n_parts=n_parts)
    other = d.select(
        (F.col("__sw_rn_s") - F.lit(offset)).alias("__sw_rn_o"),
        *[F.col(c).alias(f"{c}{suffix}") for c in cols],
    )
    return d.join(
        other, d["__sw_rn_s"] == other["__sw_rn_o"], "left"
    ).drop("__sw_rn_o", "__sw_rn_s")


def attach_running_extremum(
    df: DataFrame,
    order: list[Column | str],
    value_col: str | Column,
    out_col: str = "runmax",
    kind: str = "max",
    n_parts: int | None = None,
) -> DataFrame:
    """Distributed running max/min of ``value_col`` under ``ORDER BY
    order``: per-partition running extremum combined with the extremum
    of all preceding partitions (offsets table, ≤ n_parts rows)."""
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    oe = _order_exprs(order)
    agg = F.max if kind == "max" else F.min
    comb = F.greatest if kind == "max" else F.least
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    d = df.repartitionByRange(n_parts, *oe).withColumn(_PID, F.spark_partition_id())
    intra = Window.partitionBy(_PID).orderBy(*oe).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = d.withColumn("__sw_rx", agg(v).over(intra))
    sizes = d.groupBy(_PID).agg(agg(v).alias("__sw_px"))
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.withColumn("__sw_po", agg("__sw_px").over(woff)).drop("__sw_px")
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(out_col, comb(F.col("__sw_rx"), F.col("__sw_po")))
        .drop(_PID, "__sw_rx", "__sw_po")
    )


def ntile_expr(rank_col: str, total: Column, k: int) -> Column:
    """Spark-semantics NTILE(k) from a precomputed global rank and the
    total row count: the first ``n % k`` tiles get ``n//k + 1`` rows.
    Use with :func:`attach_rank` + a broadcast count scalar."""
    rn = F.col(rank_col).cast("long")
    base = (total / k).cast("long")
    rem = total - base * k
    big = rem * (base + 1)
    return (
        F.when(rn <= big, (rn - 1) / (base + 1))
        .otherwise(rem + (rn - 1 - big) / base)
        .cast("long")
        + 1
    ).cast("int")
