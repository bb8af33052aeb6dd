"""Hundred-thirty-sixth oracle-registry module: partial
autocorrelation + exact small-table independence — closing the
AR-order-selection and tiny-cell-count gaps of the time-series and
contingency suites:

  * pacf_events — partial autocorrelation of the daily count series
    at lags 1-3 via the Durbin-Levinson recursion over the sample
    ACF (φ11 = r1, φ22 = (r2−r1²)/(1−r1²), φ33 from the level-2
    coefficients).  ACF terms come from an index self-join on the
    day table (bounded: days, not rows); the PACF is what picks the
    AR order that autocorr_events alone cannot (ACF tails off, PACF
    cuts off).  Emits (lag, acf, pacf).

  * fisher_exact_events — Fisher's exact test (one-sided, greater)
    on the 2×2 table click-vs-other × even-vs-odd user over a
    bounded event slice: hypergeometric tail Σ_{k≥a} C(C,k)
    C(N−C,R−k)/C(N,R) computed with a log-factorial table built by
    sequence + cumsum (neither engine ships lgamma in common SQL),
    exact where chi2_type_user's asymptotics break on small cells.
    Emits the observed cell, margins, expected count, and p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ACF_SQL = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS x
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT x, row_number() OVER (ORDER BY d) AS i FROM daily
    ),
    mu AS (SELECT AVG(x) AS m, COUNT(*) AS n FROM seq),
    denom AS (
      SELECT SUM(POW(s.x - mu.m, 2)) AS c0 FROM seq s CROSS JOIN mu
    ),
    r AS (
      SELECT k.k,
             SUM((a.x - mu.m) * (b.x - mu.m)) / MAX(d.c0) AS acf
      FROM (SELECT unnest([1, 2, 3]) AS k) k
      JOIN seq a ON TRUE
      JOIN seq b ON b.i = a.i + k.k
      CROSS JOIN mu CROSS JOIN denom d
      GROUP BY k.k
    )
"""

_PACF_SQL = (
    _ACF_SQL
    + """,
    wide AS (
      SELECT MAX(CASE WHEN k = 1 THEN acf END) AS r1,
             MAX(CASE WHEN k = 2 THEN acf END) AS r2,
             MAX(CASE WHEN k = 3 THEN acf END) AS r3
      FROM r
    ),
    dl AS (
      SELECT r1, r2, r3,
             r1 AS p1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS p2
      FROM wide
    ),
    dl2 AS (
      SELECT r1, r2, r3, p1, p2,
             r1 * (1 - p2) AS a21
      FROM dl
    )
    SELECT CAST(1 AS BIGINT) AS lag, ROUND(r1, 6) AS acf,
           ROUND(p1, 6) AS pacf FROM dl2
    UNION ALL
    SELECT CAST(2 AS BIGINT), ROUND(r2, 6), ROUND(p2, 6) FROM dl2
    UNION ALL
    SELECT CAST(3 AS BIGINT), ROUND(r3, 6),
           ROUND((r3 - a21 * r2 - p2 * r1)
                 / (1 - a21 * r1 - p2 * r2), 6) FROM dl2
"""
)


@register("pacf_events", _PACF_SQL)
def pacf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    # day-level global window (bounded by the series length)
    seq = daily.withColumn(
        "i", F.row_number().over(Window.orderBy("d"))
    ).select("i", "x")
    mu = seq.agg(F.avg("x").alias("m"), F.count("*").alias("n"))
    denom = seq.crossJoin(F.broadcast(mu)).agg(
        F.sum(F.pow(F.col("x") - F.col("m"), 2)).alias("c0")
    )
    ks = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    a = seq.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = seq.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    r = (
        ks.crossJoin(a)
        .join(b, F.col("ib") == F.col("ia") + F.col("k"))
        .crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(denom))
        .groupBy("k")
        .agg(
            (
                F.sum((F.col("xa") - F.col("m")) * (F.col("xb") - F.col("m")))
                / F.max("c0")
            ).alias("acf")
        )
    )
    wide = r.agg(
        F.max(F.when(F.col("k") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("acf"))).alias("r3"),
    )
    dl2 = wide.select(
        "r1",
        "r2",
        "r3",
        F.col("r1").alias("p1"),
        ((F.col("r2") - F.col("r1") * F.col("r1"))
         / (1 - F.col("r1") * F.col("r1"))).alias("p2"),
    ).withColumn("a21", F.col("r1") * (1 - F.col("p2")))
    row1 = dl2.select(
        F.lit(1).cast("long").alias("lag"),
        F.round("r1", 6).alias("acf"),
        F.round("p1", 6).alias("pacf"),
    )
    row2 = dl2.select(
        F.lit(2).cast("long").alias("lag"),
        F.round("r2", 6).alias("acf"),
        F.round("p2", 6).alias("pacf"),
    )
    p3 = (
        F.col("r3") - F.col("a21") * F.col("r2") - F.col("p2") * F.col("r1")
    ) / (1 - F.col("a21") * F.col("r1") - F.col("p2") * F.col("r2"))
    row3 = dl2.select(
        F.lit(3).cast("long").alias("lag"),
        F.round("r3", 6).alias("acf"),
        F.round(p3, 6).alias("pacf"),
    )
    return row1.unionAll(row2).unionAll(row3)


_FISHER_SQL = """
    WITH ev AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_even
      FROM events WHERE event_id < 2000
    ),
    cells AS (
      SELECT CAST(SUM(is_click * is_even) AS BIGINT) AS a,
             CAST(SUM(is_click) AS BIGINT) AS r_total,
             CAST(SUM(is_even) AS BIGINT) AS c_total,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev
    ),
    lf AS (
      SELECT 0 AS i, 0.0 AS lf
      UNION ALL
      SELECT i, SUM(ln(i * 1.0)) OVER (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
      FROM (SELECT unnest(range(1, (SELECT n FROM cells) + 1)) AS i)
    ),
    krange AS (
      SELECT unnest(range(
        (SELECT GREATEST(0, r_total + c_total - n) FROM cells),
        (SELECT LEAST(r_total, c_total) FROM cells) + 1)) AS k
    ),
    probs AS (
      SELECT k.k,
             exp(lc.lf - lk.lf - lck.lf
                 + lnc.lf - lrk.lf - lrest.lf
                 - (ln_.lf - lr.lf - lnr.lf)) AS p
      FROM krange k CROSS JOIN cells c
      JOIN lf lc ON lc.i = c.c_total
      JOIN lf lk ON lk.i = k.k
      JOIN lf lck ON lck.i = c.c_total - k.k
      JOIN lf lnc ON lnc.i = c.n - c.c_total
      JOIN lf lrk ON lrk.i = c.r_total - k.k
      JOIN lf lrest ON lrest.i = c.n - c.c_total - c.r_total + k.k
      JOIN lf ln_ ON ln_.i = c.n
      JOIN lf lr ON lr.i = c.r_total
      JOIN lf lnr ON lnr.i = c.n - c.r_total
      WHERE k.k >= 0 AND c.c_total - k.k >= 0
        AND c.r_total - k.k >= 0
        AND c.n - c.c_total - c.r_total + k.k >= 0
    )
    SELECT CAST(c.a AS BIGINT) AS a_obs,
           CAST(c.r_total AS BIGINT) AS r_total,
           CAST(c.c_total AS BIGINT) AS c_total,
           CAST(c.n AS BIGINT) AS n,
           ROUND(c.r_total * 1.0 * c.c_total / c.n, 6) AS expected_a,
           ROUND((SELECT SUM(p) FROM probs WHERE k >= c.a), 6)
             AS p_greater
    FROM cells c
"""


@register("fisher_exact_events", _FISHER_SQL)
def fisher_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ev = e.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias(
            "is_click"
        ),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_even"),
    )
    cells = ev.agg(
        F.sum(F.col("is_click") * F.col("is_even")).alias("a"),
        F.sum("is_click").alias("r_total"),
        F.sum("is_even").alias("c_total"),
        F.count("*").alias("n"),
    )
    # log-factorial table via sequence + bounded cumsum (size = slice rows)
    ints = cells.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    )
    lf_pos = ints.withColumn(
        "lf",
        F.sum(F.log(F.col("i") * 1.0)).over(
            Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    lf = lf_pos.select("i", "lf").unionAll(
        cells.select(F.lit(0).alias("i"), F.lit(0.0).alias("lf"))
    )
    krange = cells.select(
        F.explode(
            F.sequence(
                F.greatest(
                    F.lit(0), F.col("r_total") + F.col("c_total") - F.col("n")
                ),
                F.least(F.col("r_total"), F.col("c_total")),
            )
        ).alias("k")
    )

    def lf_at(expr, alias):
        return lf.select(
            F.col("i").alias(f"i_{alias}"), F.col("lf").alias(alias)
        ).hint("broadcast"), expr

    base = krange.crossJoin(F.broadcast(cells))
    joins = [
        ("lc", F.col("c_total")),
        ("lk", F.col("k")),
        ("lck", F.col("c_total") - F.col("k")),
        ("lnc", F.col("n") - F.col("c_total")),
        ("lrk", F.col("r_total") - F.col("k")),
        ("lrest", F.col("n") - F.col("c_total") - F.col("r_total") + F.col("k")),
        ("ln_", F.col("n")),
        ("lr", F.col("r_total")),
        ("lnr", F.col("n") - F.col("r_total")),
    ]
    probs = base.filter(
        (F.col("k") >= 0)
        & (F.col("c_total") - F.col("k") >= 0)
        & (F.col("r_total") - F.col("k") >= 0)
        & (F.col("n") - F.col("c_total") - F.col("r_total") + F.col("k") >= 0)
    )
    for alias, expr in joins:
        tbl, _ = lf_at(expr, alias)
        probs = probs.join(tbl, expr == F.col(f"i_{alias}"))
    probs = probs.select(
        "k",
        "a",
        F.exp(
            F.col("lc")
            - F.col("lk")
            - F.col("lck")
            + F.col("lnc")
            - F.col("lrk")
            - F.col("lrest")
            - (F.col("ln_") - F.col("lr") - F.col("lnr"))
        ).alias("p"),
    )
    tail = probs.filter(F.col("k") >= F.col("a")).agg(
        F.sum("p").alias("p_greater")
    )
    return cells.crossJoin(F.broadcast(tail)).select(
        F.col("a").cast("long").alias("a_obs"),
        F.col("r_total").cast("long").alias("r_total"),
        F.col("c_total").cast("long").alias("c_total"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("r_total") * 1.0 * F.col("c_total") / F.col("n"), 6
        ).alias("expected_a"),
        F.round("p_greater", 6).alias("p_greater"),
    )
