"""Two-hundred-third oracle-registry module: scale-localized energy
and a third randomness lens for the value series.

  * haar_energy_events — Haar wavelet energy spectrum of the first
    512 hours of the hourly mean-value series (means ROUNDED to 6):
    five unrolled transform levels, each pairing consecutive
    samples into averages (s) and differences (d) via a floor(i/2)
    groupBy, reporting per level the detail energy sum(d^2) and its
    share of the total detail energy.  Level 1 ≈ hour-to-hour noise, level 5 ≈ 32-hour
    swings — the dyadic-scale energy budget, localized in TIME
    where periodogram_events' Fourier basis is not (a single burst
    lights one Haar coefficient but smears across all frequencies).

  * turning_points_events — the classical turning-points randomness
    test on the daily mean series: count local extrema
    (x_{t-1} < x_t > x_{t+1} or the reverse), with exact null
    moments E[T] = 2(n-2)/3 and Var[T] = (16n - 29)/90 → z.
    Sensitive to over-smoothing (too FEW turning points — e.g. a
    leaked moving average in a "raw" feed), which runs_test_events
    (median crossings) largely misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_LEVELS = 5
_NPTS = 512


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _haar_sql() -> str:
    blocks = [
        """hourly AS (
      SELECT date_trunc('hour', ts) AS h, ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
    ),
    s0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS i, x AS s
      FROM hourly QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= %d
    )"""
        % _NPTS
    ]
    for lv in range(1, _LEVELS + 1):
        p = lv - 1
        blocks.append(
            f"""l{lv} AS (
      SELECT CAST(FLOOR(i / 2) AS BIGINT) AS i2,
             (MAX(CASE WHEN i % 2 = 0 THEN s END)
              + MAX(CASE WHEN i % 2 = 1 THEN s END)) / 2 AS s,
             (MAX(CASE WHEN i % 2 = 0 THEN s END)
              - MAX(CASE WHEN i % 2 = 1 THEN s END)) / 2 AS d
      FROM s{p} GROUP BY CAST(FLOOR(i / 2) AS BIGINT)
      HAVING COUNT(*) = 2
    ),
    s{lv} AS (SELECT i2 AS i, s FROM l{lv})"""
        )
    energies = ",\n    ".join(
        f"""e{lv} AS (
      SELECT {lv} AS level, SUM(d * d) AS e, COUNT(*) AS ncoef
      FROM l{lv} WHERE d IS NOT NULL
    )"""
        for lv in range(1, _LEVELS + 1)
    )
    unions = "\n      UNION ALL ".join(
        f"SELECT * FROM e{lv}" for lv in range(1, _LEVELS + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + ",\n    "
        + energies
        + f""",
    alle AS ({unions}),
    tot AS (SELECT SUM(e) AS te FROM alle)
    SELECT level, CAST(ncoef AS BIGINT) AS n_coefs,
           ROUND(e, 6) AS detail_energy,
           ROUND(e / (SELECT te FROM tot), 6) AS energy_share
    FROM alle
    ORDER BY level"""
    )


@register("haar_energy_events", _haar_sql())
def haar_energy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    s = (
        hourly.select(
            (F.row_number().over(Window.orderBy("h")) - 1).alias("i"),
            F.col("x").alias("s"),
        )
        .where(F.col("i") < _NPTS)
    )
    energies = []
    for lv in range(1, _LEVELS + 1):
        paired = (
            s.groupBy(F.floor(F.col("i") / 2).cast("long").alias("i2"))
            .agg(
                F.max(F.when(F.col("i") % 2 == 0, F.col("s"))).alias("a"),
                F.max(F.when(F.col("i") % 2 == 1, F.col("s"))).alias("b"),
                F.count("*").alias("c"),
            )
            .where(F.col("c") == 2)
            .select(
                F.col("i2").alias("i"),
                ((F.col("a") + F.col("b")) / 2).alias("s"),
                ((F.col("a") - F.col("b")) / 2).alias("d"),
            )
        )
        energies.append(
            paired.where(F.col("d").isNotNull()).agg(
                F.lit(lv).alias("level"),
                F.sum(F.col("d") * F.col("d")).alias("e"),
                F.count("*").alias("ncoef"),
            )
        )
        s = paired.select("i", "s")
    alle = energies[0]
    for e in energies[1:]:
        alle = alle.unionByName(e)
    tot = alle.agg(F.sum("e").alias("te"))
    return (
        alle.crossJoin(F.broadcast(tot))
        .select(
            "level",
            F.col("ncoef").cast("long").alias("n_coefs"),
            F.round("e", 6).alias("detail_energy"),
            F.round(F.col("e") / F.col("te"), 6).alias("energy_share"),
        )
        .orderBy("level")
    )


_TP_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
    ),
    tri AS (
      SELECT LAG(x) OVER (ORDER BY d) AS xm, x,
             LEAD(x) OVER (ORDER BY d) AS xp
      FROM daily
    ),
    tp AS (
      SELECT COUNT(*) AS n_inner,
             SUM(CASE WHEN (x > xm AND x > xp) OR (x < xm AND x < xp)
                      THEN 1 ELSE 0 END) AS t
      FROM tri WHERE xm IS NOT NULL AND xp IS NOT NULL
    ),
    n AS (SELECT COUNT(*) AS n FROM daily)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
           CAST(t AS BIGINT) AS turning_points,
           ROUND(2.0 * ((SELECT n FROM n) - 2) / 3, 4) AS expected,
           ROUND((t - 2.0 * ((SELECT n FROM n) - 2) / 3)
                 / SQRT((16.0 * (SELECT n FROM n) - 29) / 90), 6) AS z
    FROM tp
"""


@register("turning_points_events", _TP_SQL)
def turning_points_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    n = daily.count()
    wd = Window.orderBy("d")
    tri = daily.select(
        F.lag("x").over(wd).alias("xm"),
        "x",
        F.lead("x").over(wd).alias("xp"),
    ).where(F.col("xm").isNotNull() & F.col("xp").isNotNull())
    tp = tri.agg(
        F.sum(
            F.when(
                ((F.col("x") > F.col("xm")) & (F.col("x") > F.col("xp")))
                | ((F.col("x") < F.col("xm")) & (F.col("x") < F.col("xp"))),
                1,
            ).otherwise(0)
        ).alias("t")
    )
    exp_t = 2.0 * (n - 2) / 3
    var_t = (16.0 * n - 29) / 90
    return tp.select(
        F.lit(n).cast("long").alias("n"),
        F.col("t").cast("long").alias("turning_points"),
        F.round(F.lit(exp_t), 4).alias("expected"),
        F.round((F.col("t") - exp_t) / var_t ** 0.5, 6).alias("z"),
    )
