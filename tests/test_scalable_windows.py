"""attach_rank / attach_running_sum must be value-identical to the
single-partition global window they replace, at several partitionings
and with cross-partition ties."""

import pytest
from pyspark.sql import Window, functions as F

from lnex_spark.operators.scalable_windows import attach_rank, attach_running_sum


@pytest.fixture(scope="module")
def vals(spark):
    # ties (v repeats), negative values, and enough rows to span
    # every range partition
    rows = [(i, (i * 7919) % 97 - 48, f"k{i:04d}") for i in range(500)]
    return spark.createDataFrame(rows, "id long, v long, k string")


def _canon(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_rank_matches_global_window(vals):
    order = [F.col("v").asc(), F.col("k").asc()]
    w = Window.orderBy(*order)
    want = _canon(
        vals.withColumn("rn", F.row_number().over(w)), ["id", "rn"]
    )
    for d in (vals, vals.repartition(7), vals.coalesce(1)):
        got = _canon(attach_rank(d, order, rank_col="rn"), ["id", "rn"])
        assert got == want


def test_rank_and_cumsum_match_global_window(vals):
    order = [F.col("v").asc(), F.col("k").asc()]
    w = Window.orderBy(*order)
    ww = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = _canon(
        vals.withColumn("rn", F.row_number().over(w)).withColumn(
            "cum", F.sum("v").over(ww)
        ),
        ["id", "rn", "cum"],
    )
    got = _canon(
        attach_rank(vals.repartition(5), order, rank_col="rn", cumsum_of="v", cumsum_col="cum"),
        ["id", "rn", "cum"],
    )
    assert got == want


def test_running_sum_desc_order(vals):
    order = [F.col("v").desc(), F.col("k").desc()]
    ww = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = _canon(vals.withColumn("cum", F.sum("v").over(ww)), ["id", "cum"])
    got = _canon(
        attach_running_sum(vals.repartition(9), order, "v", out_col="cum"), ["id", "cum"]
    )
    assert got == want


def test_no_single_partition_exchange_in_plan(vals):
    """The scale contract itself: the data path must go through a
    hash exchange on the data-derived bucket id, never a
    single-partition exchange; only the bucket-count-bounded offsets
    table may pass through one."""
    order = [F.col("v").asc(), F.col("k").asc()]
    out = attach_rank(vals, order, rank_col="rn")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__sw_bucket" in plan


def test_rank_deterministic_across_runs(vals):
    """Regression for the round-4 bug class: Spark's range-exchange
    sampling is nondeterministic per execution, so partition-id-based
    offsets could disagree between the data and offsets subtrees.
    Buckets are now a pure function of the data — repeated runs and a
    crossJoin-bearing input must give identical ranks."""
    one = vals.agg(F.count("*").alias("_n"))
    d = vals.crossJoin(F.broadcast(one))
    order = [F.col("v").asc(), F.col("k").asc()]
    runs = [
        _canon(attach_rank(d, order, rank_col="rn"), ["id", "rn"])
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]


def test_empty_input(spark):
    e = spark.createDataFrame([], "v long, k string")
    assert attach_rank(e, [F.col("v"), F.col("k")], rank_col="rn").count() == 0


def test_rank_ties_matches_global_rank(vals):
    # many ties on v alone
    order = [F.col("v").asc()]
    w = Window.orderBy(*order)
    want = _canon(vals.withColumn("rk", F.rank().over(w)), ["id", "rk"])
    from lnex_spark.operators.scalable_windows import attach_rank_ties

    got = _canon(
        attach_rank_ties(vals.repartition(6), [F.col("v").asc(), F.col("k").asc()],
                         ["v"], rank_col="rk"),
        ["id", "rk"],
    )
    # NOTE: attach_rank_ties needs a total order for the row_number but
    # tie groups come from order_key_cols; rank() over v alone equals
    # min row_number within each v group regardless of tie-break choice
    assert got == want


def test_shift_matches_lag_lead(vals):
    from lnex_spark.operators.scalable_windows import attach_shift

    order = [F.col("v").asc(), F.col("k").asc()]
    w = Window.orderBy(*order)
    want = _canon(
        vals.withColumn("v_lag1", F.lag("v", 1).over(w)).withColumn(
            "v_lead2", F.lead("v", 2).over(w)
        ),
        ["id", "v_lag1", "v_lead2"],
    )
    got_df = attach_shift(vals.repartition(4), order, ["v"], offset=-1)
    got_df = attach_shift(got_df, order, ["v"], offset=2)
    got = _canon(got_df, ["id", "v_lag1", "v_lead2"])
    assert got == want


def test_running_extremum(vals):
    from lnex_spark.operators.scalable_windows import attach_running_extremum

    order = [F.col("k").asc()]
    ww = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = _canon(
        vals.withColumn("rmax", F.max("v").over(ww)).withColumn(
            "rmin", F.min("v").over(ww)
        ),
        ["id", "rmax", "rmin"],
    )
    d = attach_running_extremum(vals.repartition(7), order, "v", "rmax", "max")
    d = attach_running_extremum(d, order, "v", "rmin", "min")
    assert _canon(d, ["id", "rmax", "rmin"]) == want


def test_ntile_expr_matches_spark_ntile(vals):
    from lnex_spark.operators.scalable_windows import attach_rank, ntile_expr

    order = [F.col("v").asc(), F.col("k").asc()]
    for k in (3, 7, 500, 501):
        w = Window.orderBy(*order)
        want = _canon(vals.withColumn("t", F.ntile(k).over(w)), ["id", "t"])
        n = vals.count()
        got = _canon(
            attach_rank(vals, order, rank_col="rn").withColumn(
                "t", ntile_expr("rn", F.lit(n), k)
            ),
            ["id", "t"],
        )
        assert got == want, f"k={k}"


def test_edge_values_match_window_form(vals):
    from lnex_spark.operators.scalable_windows import attach_edge_values

    # value column with nulls: only even v's carry a value
    d = vals.withColumn("val", F.when(F.col("v") % 2 == 0, F.col("v")))
    order = [F.col("v").asc(), F.col("k").asc()]
    w = Window.orderBy(*order)
    want = _canon(
        d.withColumn(
            "prev", F.last("val", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1))
        ).withColumn(
            "nxt", F.first("val", ignorenulls=True).over(
                w.rowsBetween(1, Window.unboundedFollowing))
        ),
        ["id", "prev", "nxt"],
    )
    got = _canon(
        attach_edge_values(
            d, order,
            [(F.col("val"), "prev", "prev"), (F.col("val"), "nxt", "next")],
        ),
        ["id", "prev", "nxt"],
    )
    assert got == want
