"""Hundred-ninety-fourth oracle-registry module: point-pattern
statistics on the deterministic customer cloud (lat = (custkey %
170) - 85 + 0.25, lon = (custkey % 350) - 175 + 0.5, subsampled
custkey % 10 = 0 so the pair count stays bounded at every scale) —
the distance-based complements of the lattice-based Moran/Getis ops.

  * ripley_k_cells — Ripley's K at radii r = 5, 10, 20, 40 degrees
    (no edge correction; the bias is shared by the CSR reference):
    K(r) = A/(n(n-1)) * #{ordered pairs within r}, compared to the
    CSR expectation pi r^2 via the L-defect L(r) - r =
    sqrt(K/pi) - r.  Positive defect → clustering at that SCALE,
    negative → inhibition; the multi-scale view a single NN
    statistic cannot give.

  * clark_evans_cells — Clark-Evans aggregation index R = mean
    nearest-neighbor distance / (0.5 sqrt(A/n)) with the z-test
    z = (robs - rexp) / (0.26136 sqrt(A) / n): R < 1 clustered,
    R = 1 Poisson, R → 2.15 for a perfect lattice.  This cloud is
    hash-scattered on a lattice-like grid, so R lands ABOVE 1 —
    the placebo direction, same as morans_i_cells' near-zero I.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_AREA = 170.0 * 350.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PTS_SQL = """pts AS (
      SELECT c_custkey AS k,
             (c_custkey % 170) - 85 + 0.25 AS lat,
             (c_custkey % 350) - 175 + 0.5 AS lon
      FROM customer WHERE c_custkey % 10 = 0
    )"""


_RIPLEY_SQL = f"""
    WITH {_PTS_SQL},
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pts),
    pairs AS (
      SELECT SQRT((a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)) AS d
      FROM pts a JOIN pts b ON a.k <> b.k
    ),
    radii AS (SELECT CAST(UNNEST([5, 10, 20, 40]) AS DOUBLE) AS r),
    counts AS (
      SELECT r.r, SUM(CASE WHEN p.d <= r.r THEN 1 ELSE 0 END) AS c
      FROM radii r CROSS JOIN pairs p
      GROUP BY r.r
    )
    SELECT c.r AS radius,
           CAST(c.c AS BIGINT) AS pairs_within,
           ROUND({_AREA!r} / ((SELECT n FROM n) * ((SELECT n FROM n) - 1))
                 * c.c, 4) AS k_r,
           ROUND(PI() * c.r * c.r, 4) AS k_csr,
           ROUND(SQRT({_AREA!r} / ((SELECT n FROM n)
                      * ((SELECT n FROM n) - 1)) * c.c / PI()) - c.r, 4)
             AS l_defect
    FROM counts c
    ORDER BY radius
"""


@register("ripley_k_cells", _RIPLEY_SQL)
def ripley_k_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    pts = cu.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") % 170) - 85 + 0.25).alias("lat"),
        ((F.col("c_custkey") % 350) - 175 + 0.5).alias("lon"),
    )
    n = float(pts.count())
    a = pts.alias("a")
    b = pts.alias("b")
    pairs = a.join(b, F.col("a.k") != F.col("b.k")).select(
        F.sqrt(
            (F.col("a.lat") - F.col("b.lat"))
            * (F.col("a.lat") - F.col("b.lat"))
            + (F.col("a.lon") - F.col("b.lon"))
            * (F.col("a.lon") - F.col("b.lon"))
        ).alias("d")
    )
    radii = cu.sparkSession.createDataFrame(
        [(5.0,), (10.0,), (20.0,), (40.0,)], "r double"
    )
    counts = (
        F.broadcast(radii)
        .crossJoin(pairs)
        .groupBy("r")
        .agg(F.sum(F.when(F.col("d") <= F.col("r"), 1).otherwise(0)).alias("c"))
    )
    import math

    k_r = _AREA / (n * (n - 1)) * F.col("c")
    return counts.select(
        F.col("r").alias("radius"),
        F.col("c").cast("long").alias("pairs_within"),
        F.round(k_r, 4).alias("k_r"),
        F.round(math.pi * F.col("r") * F.col("r"), 4).alias("k_csr"),
        F.round(F.sqrt(k_r / math.pi) - F.col("r"), 4).alias("l_defect"),
    ).orderBy("radius")


_CLARK_SQL = f"""
    WITH {_PTS_SQL},
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pts),
    nnd AS (
      SELECT a.k,
             MIN(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                      + (a.lon - b.lon) * (a.lon - b.lon))) AS d
      FROM pts a JOIN pts b ON a.k <> b.k
      GROUP BY a.k
    ),
    agg AS (
      SELECT AVG(d) AS robs,
             0.5 * SQRT({_AREA!r} / (SELECT n FROM n)) AS rexp,
             (SELECT n FROM n) AS n
      FROM nnd
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND(robs, 6) AS mean_nn_dist,
           ROUND(rexp, 6) AS csr_expected,
           ROUND(robs / rexp, 6) AS clark_evans_r,
           ROUND((robs - rexp) / (0.26136 * SQRT({_AREA!r}) / n), 6) AS z
    FROM agg
"""


@register("clark_evans_cells", _CLARK_SQL)
def clark_evans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    pts = cu.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") % 170) - 85 + 0.25).alias("lat"),
        ((F.col("c_custkey") % 350) - 175 + 0.5).alias("lon"),
    )
    n = float(pts.count())
    a = pts.alias("a")
    b = pts.alias("b")
    nnd = (
        a.join(b, F.col("a.k") != F.col("b.k"))
        .groupBy(F.col("a.k"))
        .agg(
            F.min(
                F.sqrt(
                    (F.col("a.lat") - F.col("b.lat"))
                    * (F.col("a.lat") - F.col("b.lat"))
                    + (F.col("a.lon") - F.col("b.lon"))
                    * (F.col("a.lon") - F.col("b.lon"))
                )
            ).alias("d")
        )
    )
    rexp = 0.5 * (_AREA / n) ** 0.5
    return nnd.agg(
        F.lit(int(n)).cast("long").alias("n_points"),
        F.round(F.avg("d"), 6).alias("mean_nn_dist"),
        F.round(F.lit(rexp), 6).alias("csr_expected"),
        F.round(F.avg("d") / rexp, 6).alias("clark_evans_r"),
        F.round(
            (F.avg("d") - rexp) / (0.26136 * (_AREA ** 0.5) / n), 6
        ).alias("z"),
    )
