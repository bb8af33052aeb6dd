"""Hundred-sixty-second oracle-registry module: spatial
autocorrelation — the global and local statistics that complete the
geo suite (grid / geohash / z-order / nearest-site) with actual
spatial INFERENCE.

Both use the registry's deterministic customer point cloud
(lat = (c_custkey % 170) - 85 + 0.25, lon = (c_custkey % 350) - 175
+ 0.5, value = c_acctbal) aggregated to a 10-degree grid with
per-cell mean balance ROUNDED to 6, and rook adjacency (|dr|+|dc|=1)
via a self-join on cell coordinates — the neighbor join is on the
CELL table (bounded at any scale), never on raw points.

  * morans_i_cells — global Moran's I with binary rook weights:
    I = (n/W) * sum_ij w_ij (x_i-xbar)(x_j-xbar) / sum_i (x_i-xbar)^2,
    plus E[I] = -1/(n-1) and the z-ish ratio I/|E[I]|.  Answers "is
    high balance spatially clustered at all" before any hotspot
    hunt; I ≈ E[I] → spatially random (the expected readout for the
    hash-scattered cloud — a placebo check like rdd's).

  * getis_ord_cells — local Getis-Ord Gi* per cell (self-inclusive
    weights): z_i = (sum_j∈N*_i x_j - xbar k_i) /
    (S sqrt((n k_i - k_i^2)/(n-1))) with global xbar, S and
    k_i = |N*_i|.  The per-cell hotspot/coldspot z-score used for
    disaster-mention density mapping — LNEx's flood use case asks
    exactly this of the extracted location counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CELLS_SQL = """cells AS (
      SELECT CAST(FLOOR(((c_custkey % 170) - 85 + 0.25) / 10) AS INTEGER)
               AS r,
             CAST(FLOOR(((c_custkey % 350) - 175 + 0.5) / 10) AS INTEGER)
               AS c,
             ROUND(AVG(c_acctbal), 6) AS x
      FROM customer GROUP BY 1, 2
    )"""


_MORAN_SQL = f"""
    WITH {_CELLS_SQL},
    mean AS (SELECT COUNT(*) AS n, AVG(x) AS xbar FROM cells),
    pairs AS (
      SELECT a.x AS xa, b.x AS xb
      FROM cells a JOIN cells b
        ON ABS(a.r - b.r) + ABS(a.c - b.c) = 1
    ),
    num AS (
      SELECT COUNT(*) AS w,
             SUM((xa - (SELECT xbar FROM mean))
                 * (xb - (SELECT xbar FROM mean))) AS s
      FROM pairs
    ),
    den AS (
      SELECT SUM((x - (SELECT xbar FROM mean))
                 * (x - (SELECT xbar FROM mean))) AS d
      FROM cells
    )
    SELECT CAST(m.n AS BIGINT) AS n_cells,
           CAST(num.w AS BIGINT) AS w_sum,
           ROUND(m.n * num.s / (num.w * den.d), 6) AS moran_i,
           ROUND(-1.0 / (m.n - 1), 6) AS e_i
    FROM mean m CROSS JOIN num CROSS JOIN den
"""


@register("morans_i_cells", _MORAN_SQL)
def morans_i_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    cells = cu.groupBy(
        F.floor(((F.col("c_custkey") % 170) - 85 + 0.25) / 10)
        .cast("int")
        .alias("r"),
        F.floor(((F.col("c_custkey") % 350) - 175 + 0.5) / 10)
        .cast("int")
        .alias("c"),
    ).agg(F.round(F.avg("c_acctbal"), 6).alias("x"))
    mean = cells.agg(F.count("*").alias("n"), F.avg("x").alias("xbar"))
    a = cells.alias("a")
    b = cells.alias("b")
    pairs = a.join(
        b,
        (F.abs(F.col("a.r") - F.col("b.r")) + F.abs(F.col("a.c") - F.col("b.c")))
        == 1,
    ).select(F.col("a.x").alias("xa"), F.col("b.x").alias("xb"))
    num = pairs.crossJoin(F.broadcast(mean.select("xbar"))).agg(
        F.count("*").alias("w"),
        F.sum((F.col("xa") - F.col("xbar")) * (F.col("xb") - F.col("xbar"))).alias("s"),
    )
    den = cells.crossJoin(F.broadcast(mean.select("xbar"))).agg(
        F.sum((F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar"))).alias("d")
    )
    return mean.select("n").crossJoin(F.broadcast(num)).crossJoin(F.broadcast(den)).select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("w").cast("long").alias("w_sum"),
        F.round(F.col("n") * F.col("s") / (F.col("w") * F.col("d")), 6).alias(
            "moran_i"
        ),
        F.round(-1.0 / (F.col("n") - 1), 6).alias("e_i"),
    )


_GETIS_SQL = f"""
    WITH {_CELLS_SQL},
    mean AS (
      SELECT COUNT(*) AS n, AVG(x) AS xbar,
             SQRT(AVG(x * x) - AVG(x) * AVG(x)) AS s
      FROM cells
    ),
    nb AS (
      SELECT a.r, a.c, COUNT(*) AS k, SUM(b.x) AS sx
      FROM cells a JOIN cells b
        ON ABS(a.r - b.r) + ABS(a.c - b.c) <= 1
      GROUP BY a.r, a.c
    )
    SELECT nb.r AS cell_r, nb.c AS cell_c, CAST(nb.k AS BIGINT) AS k,
           ROUND((nb.sx - m.xbar * nb.k)
                 / (m.s * SQRT((m.n * nb.k - CAST(nb.k AS DOUBLE) * nb.k)
                               / (m.n - 1))), 4) AS gi_z
    FROM nb CROSS JOIN mean m
    ORDER BY cell_r, cell_c
"""


@register("getis_ord_cells", _GETIS_SQL)
def getis_ord_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    cells = cu.groupBy(
        F.floor(((F.col("c_custkey") % 170) - 85 + 0.25) / 10)
        .cast("int")
        .alias("r"),
        F.floor(((F.col("c_custkey") % 350) - 175 + 0.5) / 10)
        .cast("int")
        .alias("c"),
    ).agg(F.round(F.avg("c_acctbal"), 6).alias("x"))
    mean = cells.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("xbar"),
        F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("s"),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    nb = (
        a.join(
            b,
            (
                F.abs(F.col("a.r") - F.col("b.r"))
                + F.abs(F.col("a.c") - F.col("b.c"))
            )
            <= 1,
        )
        .groupBy(F.col("a.r").alias("cell_r"), F.col("a.c").alias("cell_c"))
        .agg(F.count("*").alias("k"), F.sum("b.x").alias("sx"))
    )
    return (
        nb.crossJoin(F.broadcast(mean))
        .select(
            "cell_r",
            "cell_c",
            F.col("k").cast("long").alias("k"),
            F.round(
                (F.col("sx") - F.col("xbar") * F.col("k"))
                / (
                    F.col("s")
                    * F.sqrt(
                        (
                            F.col("n") * F.col("k")
                            - F.col("k").cast("double") * F.col("k")
                        )
                        / (F.col("n") - 1)
                    )
                ),
                4,
            ).alias("gi_z"),
        )
        .orderBy("cell_r", "cell_c")
    )
