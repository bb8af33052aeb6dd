"""Hundred-fifty-third oracle-registry module: nonlinear time-series
complexity — sample entropy and permutation entropy over the hourly
value series, completing the regularity toolkit next to Hurst,
autocorrelation and the spectral ops.

  * sample_entropy_events — SampEn(m=2, r=0.2*sd) of the hourly mean
    value series (hourly means ROUNDED to 6 first; r also rounded so
    every template comparison happens between identical doubles on
    both engines).  Templates are built with lead() windows over the
    hour order; the O(N^2) template match is an explicit self-join on
    row number i<j with Chebyshev distance — N ≈ 720 hours → ~260k
    pairs, constant in data volume because the series is the hourly
    ROLLUP, not the raw events.  SampEn = -ln(A/B) with A = m+1
    matches, B = m matches.

  * permutation_entropy_events — Bandt-Pompe permutation entropy of
    order 3 over the same hourly series: each consecutive triple maps
    to its ordinal pattern via the tie-stable rank code rank_i =
    #{j: x_j < x_i or (x_j = x_i and j < i)}, entropy of the pattern
    distribution normalized by ln(6).  Near 1 → noise, near 0 →
    deterministic motion; robust to monotone transforms, one window
    pass + one tiny groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HOURLY = """
      SELECT date_trunc('hour', ts) AS h, ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
"""


_SAMPEN_SQL = f"""
    WITH hourly AS ({_HOURLY}),
    ser AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h) AS i, x FROM hourly
    ),
    win AS (
      SELECT i, x AS x0,
             LEAD(x, 1) OVER (ORDER BY i) AS x1,
             LEAD(x, 2) OVER (ORDER BY i) AS x2
      FROM ser
    ),
    r AS (
      SELECT ROUND(0.2 * SQRT(AVG(x * x) - AVG(x) * AVG(x)), 6) AS r
      FROM ser
    ),
    pairs AS (
      SELECT GREATEST(ABS(a.x0 - b.x0), ABS(a.x1 - b.x1)) AS d2,
             GREATEST(ABS(a.x0 - b.x0), ABS(a.x1 - b.x1),
                      ABS(a.x2 - b.x2)) AS d3,
             a.x2 IS NOT NULL AND b.x2 IS NOT NULL AS full3
      FROM win a JOIN win b ON b.i > a.i
      WHERE a.x1 IS NOT NULL AND b.x1 IS NOT NULL
    ),
    cnt AS (
      SELECT SUM(CASE WHEN full3 AND d2 <= (SELECT r FROM r)
                      THEN 1 ELSE 0 END) AS bb,
             SUM(CASE WHEN full3 AND d3 <= (SELECT r FROM r)
                      THEN 1 ELSE 0 END) AS aa
      FROM pairs
    )
    SELECT CAST((SELECT COUNT(*) FROM ser) AS BIGINT) AS n,
           (SELECT r FROM r) AS r,
           CAST(bb AS BIGINT) AS b_matches,
           CAST(aa AS BIGINT) AS a_matches,
           ROUND(-LN(CAST(aa AS DOUBLE) / bb), 6) AS sampen
    FROM cnt
"""


@register("sample_entropy_events", _SAMPEN_SQL)
def sample_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    ser = hourly.select(
        F.row_number().over(Window.orderBy("h")).alias("i"), "x"
    )
    wo = Window.orderBy("i")
    win = ser.select(
        "i",
        F.col("x").alias("x0"),
        F.lead("x", 1).over(wo).alias("x1"),
        F.lead("x", 2).over(wo).alias("x2"),
    )
    r = ser.agg(
        F.round(
            0.2
            * F.sqrt(
                F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
            ),
            6,
        ).alias("r")
    )
    n = ser.agg(F.count("*").alias("n"))
    a = win.alias("a")
    b = win.alias("b")
    pairs = (
        a.join(b, F.col("b.i") > F.col("a.i"))
        .where(F.col("a.x1").isNotNull() & F.col("b.x1").isNotNull())
        .crossJoin(F.broadcast(r))
        .select(
            F.greatest(
                F.abs(F.col("a.x0") - F.col("b.x0")),
                F.abs(F.col("a.x1") - F.col("b.x1")),
            ).alias("d2"),
            F.greatest(
                F.abs(F.col("a.x0") - F.col("b.x0")),
                F.abs(F.col("a.x1") - F.col("b.x1")),
                F.abs(F.col("a.x2") - F.col("b.x2")),
            ).alias("d3"),
            (F.col("a.x2").isNotNull() & F.col("b.x2").isNotNull()).alias(
                "full3"
            ),
            "r",
        )
    )
    cnt = pairs.agg(
        F.sum(
            F.when(F.col("full3") & (F.col("d2") <= F.col("r")), 1).otherwise(0)
        ).alias("bb"),
        F.sum(
            F.when(F.col("full3") & (F.col("d3") <= F.col("r")), 1).otherwise(0)
        ).alias("aa"),
        F.max("r").alias("r"),
    )
    return (
        cnt.crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("long").alias("n"),
            "r",
            F.col("bb").cast("long").alias("b_matches"),
            F.col("aa").cast("long").alias("a_matches"),
            F.round(
                -F.log(F.col("aa").cast("double") / F.col("bb")), 6
            ).alias("sampen"),
        )
    )


_PERMEN_SQL = f"""
    WITH hourly AS ({_HOURLY}),
    ser AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h) AS i, x FROM hourly
    ),
    tri AS (
      SELECT x AS x0,
             LEAD(x, 1) OVER (ORDER BY i) AS x1,
             LEAD(x, 2) OVER (ORDER BY i) AS x2
      FROM ser
    ),
    codes AS (
      SELECT ((CASE WHEN x1 < x0 THEN 1 ELSE 0 END)
              + (CASE WHEN x2 < x0 THEN 1 ELSE 0 END)) * 9
             + ((CASE WHEN x0 < x1 OR x0 = x1 THEN 1 ELSE 0 END)
                + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)) * 3
             + ((CASE WHEN x0 < x2 OR x0 = x2 THEN 1 ELSE 0 END)
                + (CASE WHEN x1 < x2 OR x1 = x2 THEN 1 ELSE 0 END))
               AS code
      FROM tri WHERE x2 IS NOT NULL
    ),
    dist AS (
      SELECT code, COUNT(*) AS c FROM codes GROUP BY code
    ),
    tot AS (SELECT SUM(c) AS n FROM dist)
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           ROUND(-SUM((CAST(c AS DOUBLE) / t.n)
                      * LN(CAST(c AS DOUBLE) / t.n)), 6) AS h,
           ROUND(-SUM((CAST(c AS DOUBLE) / t.n)
                      * LN(CAST(c AS DOUBLE) / t.n)) / LN(6), 6) AS h_norm
    FROM dist CROSS JOIN tot t
    GROUP BY t.n
"""


@register("permutation_entropy_events", _PERMEN_SQL)
def permutation_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 6).alias("x")
    )
    ser = hourly.select(
        F.row_number().over(Window.orderBy("h")).alias("i"), "x"
    )
    wo = Window.orderBy("i")
    tri = ser.select(
        F.col("x").alias("x0"),
        F.lead("x", 1).over(wo).alias("x1"),
        F.lead("x", 2).over(wo).alias("x2"),
    ).where(F.col("x2").isNotNull())
    lt = lambda u, v: F.when(F.col(u) < F.col(v), 1).otherwise(0)
    le = lambda u, v: F.when(
        (F.col(u) < F.col(v)) | (F.col(u) == F.col(v)), 1
    ).otherwise(0)
    codes = tri.select(
        (
            (lt("x1", "x0") + lt("x2", "x0")) * 9
            + (le("x0", "x1") + lt("x2", "x1")) * 3
            + (le("x0", "x2") + le("x1", "x2"))
        ).alias("code")
    )
    dist = codes.groupBy("code").agg(F.count("*").alias("c"))
    tot = dist.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        dist.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.count("*").alias("n_patterns"),
            F.round(-F.sum(p * F.log(p)), 6).alias("h"),
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(6.0)), 6).alias(
                "h_norm"
            ),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_patterns").cast("long").alias("n_patterns"),
            "h",
            "h_norm",
        )
    )
