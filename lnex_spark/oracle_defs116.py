"""Hundred-sixteenth oracle-registry module: dynamic-programming
alignment and internal consistency.

  * dtw_profiles_events — dynamic time warping distance between the
    weekday profiles (avg daily count per weekday, rounded before
    the DP so both engines fold identical cells) of clicks vs
    errors.  The DP recurrence D(i,j) = c(i,j) + min(D(i−1,j),
    D(i,j−1), D(i−1,j−1)) is unrolled by ANTI-DIAGONAL — cells on
    diagonal d depend only on diagonals d−1 and d−2, so the 7×7
    table fills in 13 data-parallel waves instead of 49 sequential
    steps.  That wavefront decomposition is exactly how DP lands on
    a cluster; alongside the recursive-CTE packing replay and the
    unrolled iterative solvers, it completes the
    sequential-algorithm-made-relational set.  Every wave CTE is
    AS MATERIALIZED — inlined, DuckDB re-opens the parquet once per
    reference until fd exhaustion, the defs73 lesson again.  Emits
    the DTW distance and the Euclidean lockstep distance it
    improves on.

  * cronbach_events — Cronbach's alpha over k = 4 six-hour "items"
    rating each day: alpha = k/(k−1)·(1 − Σ item variances /
    variance of the day totals), population variances in raw-moment
    form.  The internal-consistency readout (do the day-parts
    measure one underlying activity trait?) — the psychometrics
    family's entry point, one aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_N = 7


def _dtw_diag_ctes() -> str:
    """Generate the 13 anti-diagonal wave CTEs (d0..d12)."""
    parts = []
    for d in range(2 * _N - 1):
        deps = []
        if d > 0:
            deps.append(
                f"SELECT i + 1 AS i, j, acc FROM d{d - 1} UNION ALL "
                f"SELECT i, j + 1, acc FROM d{d - 1}"
            )
        if d > 1:
            deps.append(f"SELECT i + 1 AS i, j + 1 AS j, acc FROM d{d - 2}")
        if d == 0:
            parts.append(
                "d0 AS MATERIALIZED (SELECT 0 AS i, 0 AS j, c AS acc"
                " FROM cost WHERE i = 0 AND j = 0)"
            )
        else:
            pred = " UNION ALL ".join(deps)
            parts.append(
                f"""d{d} AS MATERIALIZED (
      SELECT c.i, c.j, c.c + MIN(p.acc) AS acc
      FROM cost c JOIN ({pred}) p ON p.i = c.i AND p.j = c.j
      WHERE c.i + c.j = {d}
      GROUP BY c.i, c.j, c.c
    )"""
            )
    return ",\n    ".join(parts)


_DTW_SQL = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) % 7 AS INTEGER) AS wd,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1, 2
    ),
    prof AS MATERIALIZED (
      SELECT wd, ROUND(AVG(x * 1.0), 6) AS a, ROUND(AVG(y * 1.0), 6) AS b
      FROM daily GROUP BY wd
    ),
    cost AS MATERIALIZED (
      SELECT pa.wd AS i, pb.wd AS j, abs(pa.a - pb.b) AS c
      FROM prof pa CROSS JOIN prof pb
    ),
    {_dtw_diag_ctes()},
    lockstep AS (
      SELECT sqrt(SUM((a - b) * (a - b))) AS euclid FROM prof
    )
    SELECT ROUND((SELECT acc FROM d{2 * _N - 2}), 6) AS dtw_distance,
           ROUND((SELECT euclid FROM lockstep), 6) AS lockstep_euclid
"""


@register("dtw_profiles_events", _DTW_SQL)
def dtw_profiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.lit("2024-01-01").cast("date"),
            )
            % 7
        )
        .cast("int")
        .alias("wd"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("y"),
    )
    prof = daily.groupBy("wd").agg(
        F.round(F.avg(F.col("x") * 1.0), 6).alias("a"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("b"),
    )
    pa = prof.select(F.col("wd").alias("i"), "a")
    pb = prof.select(F.col("wd").alias("j"), "b")
    cost = pa.crossJoin(pb).select(
        "i", "j", F.abs(F.col("a") - F.col("b")).alias("c")
    )
    # anti-diagonal wavefront: each wave is one tiny join+agg; 13 waves
    waves: list[DataFrame] = []
    for d in range(2 * _N - 1):
        if d == 0:
            w = cost.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
                "i", "j", F.col("c").alias("acc")
            )
        else:
            preds = waves[d - 1].select(
                (F.col("i") + 1).alias("i"), "j", "acc"
            ).unionByName(
                waves[d - 1].select("i", (F.col("j") + 1).alias("j"), "acc")
            )
            if d > 1:
                preds = preds.unionByName(
                    waves[d - 2].select(
                        (F.col("i") + 1).alias("i"), (F.col("j") + 1).alias("j"), "acc"
                    )
                )
            w = (
                cost.filter(F.col("i") + F.col("j") == d)
                .join(preds.withColumnRenamed("acc", "pacc"), ["i", "j"])
                .groupBy("i", "j", "c")
                .agg((F.col("c") + F.min("pacc")).alias("acc"))
                .select("i", "j", "acc")
            )
        # per-wave lineage break (defs73 lesson): each wave is read up
        # to 3x by later waves — unmaterialized, the plan recomputes
        # history with Fibonacci fan-out
        waves.append(w.localCheckpoint(eager=True))
    dtw = waves[-1].select(F.col("acc").alias("dtw"))
    lockstep = prof.agg(
        F.sqrt(F.sum((F.col("a") - F.col("b")) * (F.col("a") - F.col("b")))).alias(
            "euclid"
        )
    )
    return dtw.crossJoin(lockstep).select(
        F.round("dtw", 6).alias("dtw_distance"),
        F.round("euclid", 6).alias("lockstep_euclid"),
    )


_CRON_SQL = """
    WITH items AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN date_part('hour', ts) < 6 THEN 1 ELSE 0 END) AS i1,
             SUM(CASE WHEN date_part('hour', ts) >= 6
                       AND date_part('hour', ts) < 12 THEN 1 ELSE 0 END) AS i2,
             SUM(CASE WHEN date_part('hour', ts) >= 12
                       AND date_part('hour', ts) < 18 THEN 1 ELSE 0 END) AS i3,
             SUM(CASE WHEN date_part('hour', ts) >= 18 THEN 1 ELSE 0 END) AS i4
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(i1 * i1 * 1.0) - AVG(i1 * 1.0) * AVG(i1 * 1.0) AS v1,
             AVG(i2 * i2 * 1.0) - AVG(i2 * 1.0) * AVG(i2 * 1.0) AS v2,
             AVG(i3 * i3 * 1.0) - AVG(i3 * 1.0) * AVG(i3 * 1.0) AS v3,
             AVG(i4 * i4 * 1.0) - AVG(i4 * 1.0) * AVG(i4 * 1.0) AS v4,
             AVG((i1 + i2 + i3 + i4) * (i1 + i2 + i3 + i4) * 1.0)
               - AVG((i1 + i2 + i3 + i4) * 1.0) * AVG((i1 + i2 + i3 + i4) * 1.0)
               AS vt
      FROM items
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(vt, 6) AS var_total,
           ROUND(v1 + v2 + v3 + v4, 6) AS sum_item_var,
           ROUND((4.0 / 3.0) * (1.0 - (v1 + v2 + v3 + v4) / vt), 6)
             AS cronbach_alpha
    FROM mom
"""


@register("cronbach_events", _CRON_SQL)
def cronbach_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = F.hour("ts")
    items = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(
        F.sum(F.when(h < 6, 1).otherwise(0)).alias("i1"),
        F.sum(F.when((h >= 6) & (h < 12), 1).otherwise(0)).alias("i2"),
        F.sum(F.when((h >= 12) & (h < 18), 1).otherwise(0)).alias("i3"),
        F.sum(F.when(h >= 18, 1).otherwise(0)).alias("i4"),
    )

    def var(c):
        return F.avg(c * c * 1.0) - F.avg(c * 1.0) * F.avg(c * 1.0)

    tot = F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4")
    mom = items.agg(
        F.count("*").alias("n"),
        var(F.col("i1")).alias("v1"),
        var(F.col("i2")).alias("v2"),
        var(F.col("i3")).alias("v3"),
        var(F.col("i4")).alias("v4"),
        var(tot).alias("vt"),
    )
    sv = F.col("v1") + F.col("v2") + F.col("v3") + F.col("v4")
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("vt", 6).alias("var_total"),
        F.round(sv, 6).alias("sum_item_var"),
        F.round((4.0 / 3.0) * (1.0 - sv / F.col("vt")), 6).alias("cronbach_alpha"),
    )
