"""Hundred-forty-ninth oracle-registry module: running-peak drawdown
analytics and the actuarial chain-ladder development triangle — two
prefix-scan/cohort-grid patterns the registry did not yet cover.

  * max_drawdown_events — maximum drawdown of the cumulative
    deviation-from-mean curve of daily event value (the CUSUM curve
    viewed as an equity line): daily sums ROUNDED to 2 first
    (identical summands both engines), equity = running sum over day
    order, peak = running max, drawdown = peak - equity.  Reports the
    deepest drawdown, its fraction of the peak, the peak/trough days
    (earliest on ties) and the recovery day (first day at-or-above
    the old peak after the trough, NULL if never).  The window-only
    prefix-scan pattern (one keyed sort, no join) that an anomaly
    monitor runs over a metric stream at any scale.

  * chain_ladder_orders — volume-weighted chain-ladder development
    factors over the orders→lineitem "claims triangle": cohort =
    order month, development age = months from order month to ship
    month, C(cohort, age) = cumulative revenue shipped within `age`
    months (dense 0..4 grid via a cross join against the distinct-age
    frame, only ages the cohort has fully observed).  f_age =
    sum_c C(c, age+1) / sum_c C(c, age) over cohorts observed at
    age+1, plus the cum-to-ultimate factor as the suffix product
    exp(sum log f).  The standard IBNR/maturation estimator for any
    cohort-settlement process (claims, returns, refunds, delayed
    conversions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DRAWDOWN_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1
    ),
    m AS (SELECT AVG(v) AS mu FROM daily),
    eq AS (
      SELECT d,
             SUM(v - (SELECT mu FROM m)) OVER (ORDER BY d) AS equity
      FROM daily
    ),
    dd AS (
      SELECT d, equity,
             MAX(equity) OVER (ORDER BY d) AS peak,
             MAX(equity) OVER (ORDER BY d) - equity AS draw
      FROM eq
    ),
    trough AS (
      SELECT d AS trough_day, equity AS tv, peak AS pv, draw
      FROM dd ORDER BY draw DESC, d ASC LIMIT 1
    )
    SELECT ROUND(t.draw, 2) AS max_drawdown,
           ROUND(t.draw / NULLIF(ABS(t.pv), 0), 6) AS dd_over_peak,
           (SELECT MIN(d) FROM dd
             WHERE equity = t.pv AND d <= t.trough_day) AS peak_day,
           t.trough_day,
           (SELECT MIN(d) FROM dd
             WHERE d > t.trough_day AND equity >= t.pv) AS recovery_day
    FROM trough t
"""


@register("max_drawdown_events", _DRAWDOWN_SQL)
def max_drawdown_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    mu = daily.agg(F.avg("v").alias("mu"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = (
        daily.crossJoin(F.broadcast(mu))
        .withColumn("equity", F.sum(F.col("v") - F.col("mu")).over(w))
        .withColumn("peak", F.max("equity").over(w))
        .withColumn("draw", F.col("peak") - F.col("equity"))
        .select("d", "equity", "peak", "draw")
    )
    trough = (
        dd.orderBy(F.desc("draw"), F.asc("d"))
        .limit(1)
        .select(
            F.col("d").alias("trough_day"),
            F.col("peak").alias("pv"),
            F.col("draw").alias("draw"),
        )
    )
    j = dd.crossJoin(F.broadcast(trough))
    peak_day = (
        j.where((F.col("equity") == F.col("pv")) & (F.col("d") <= F.col("trough_day")))
        .agg(F.min("d").alias("peak_day"))
    )
    recovery = (
        j.where((F.col("d") > F.col("trough_day")) & (F.col("equity") >= F.col("pv")))
        .agg(F.min("d").alias("recovery_day"))
    )
    return (
        trough.crossJoin(F.broadcast(peak_day))
        .crossJoin(F.broadcast(recovery))
        .select(
            F.round("draw", 2).alias("max_drawdown"),
            F.round(
                F.col("draw") / F.when(F.abs("pv") != 0, F.abs("pv")), 6
            ).alias("dd_over_peak"),
            "peak_day",
            "trough_day",
            "recovery_day",
        )
    )


_CHAIN_LADDER_SQL = """
    WITH rev AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS cohort,
             date_diff('month', date_trunc('month', o.o_orderdate),
                       date_trunc('month', l.l_shipdate)) AS age,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS inc
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    lastm AS (
      SELECT MAX(CAST(date_trunc('month', l_shipdate) AS DATE)) AS lm
      FROM lineitem
    ),
    grid AS (
      SELECT c.cohort, g.age
      FROM (SELECT DISTINCT cohort FROM rev) c
      CROSS JOIN (SELECT UNNEST(range(0, 5)) AS age) g
      WHERE date_diff('month', c.cohort, (SELECT lm FROM lastm)) >= g.age
    ),
    cum AS (
      SELECT g.cohort, g.age,
             ROUND((SELECT COALESCE(SUM(r.inc), 0) FROM rev r
                     WHERE r.cohort = g.cohort AND r.age <= g.age), 2)
               AS c
      FROM grid g
    ),
    f AS (
      SELECT a.age AS age,
             COUNT(*) AS n_cohorts,
             ROUND(SUM(b.c) / NULLIF(SUM(a.c), 0), 6) AS factor
      FROM cum a JOIN cum b
        ON a.cohort = b.cohort AND b.age = a.age + 1
      WHERE a.c > 0
      GROUP BY a.age
    )
    SELECT age, n_cohorts, factor,
           ROUND(EXP(SUM(LN(factor)) OVER (
             ORDER BY age DESC ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)), 6) AS cum_to_ultimate
    FROM f
    ORDER BY age
"""


@register("chain_ladder_orders", _CHAIN_LADDER_SQL)
def chain_ladder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("cohort"),
            F.months_between(
                F.date_trunc("month", "l_shipdate"),
                F.date_trunc("month", "o_orderdate"),
            )
            .cast("long")
            .alias("age"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("inc"))
    )
    lastm = li.agg(
        F.max(F.date_trunc("month", "l_shipdate").cast("date")).alias("lm")
    )
    cohorts = rev.select("cohort").distinct()
    ages = o.sparkSession.range(0, 5).select(F.col("id").alias("age"))
    grid = (
        cohorts.crossJoin(F.broadcast(ages))
        .crossJoin(F.broadcast(lastm))
        .where(
            F.months_between(F.col("lm"), F.col("cohort")).cast("long")
            >= F.col("age")
        )
        .select("cohort", "age")
    )
    cum = (
        grid.alias("g")
        .join(
            rev.alias("r"),
            (F.col("r.cohort") == F.col("g.cohort"))
            & (F.col("r.age") <= F.col("g.age")),
            "left",
        )
        .groupBy(F.col("g.cohort").alias("cohort"), F.col("g.age").alias("age"))
        .agg(F.round(F.coalesce(F.sum("r.inc"), F.lit(0.0)), 2).alias("c"))
    )
    a = cum.alias("a")
    b = cum.alias("b")
    f = (
        a.join(
            b,
            (F.col("a.cohort") == F.col("b.cohort"))
            & (F.col("b.age") == F.col("a.age") + 1),
        )
        .where(F.col("a.c") > 0)
        .groupBy(F.col("a.age").alias("age"))
        .agg(
            F.count("*").alias("n_cohorts"),
            F.round(
                F.sum("b.c") / F.when(F.sum("a.c") != 0, F.sum("a.c")), 6
            ).alias("factor"),
        )
    )
    wsuf = Window.orderBy(F.desc("age")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        f.withColumn(
            "cum_to_ultimate", F.round(F.exp(F.sum(F.log("factor")).over(wsuf)), 6)
        )
        .orderBy("age")
    )
