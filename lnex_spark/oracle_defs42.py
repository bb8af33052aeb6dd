"""Forty-second oracle-registry module: relational matrix multiply
and the new-user growth curve.

  * matmul_embeddings — dense matrix multiply as a relational
    operator: project the 64-d embeddings onto a deterministic
    64×4 weight matrix via the canonical (i,k,v)⋈(k,j,w)→group-(i,j)
    sum-of-products plan — the GEMM shape every distributed linear
    layer / random-projection / PCA-apply job reduces to.  The
    weight matrix is a pure index formula (((k·7 + j·3) mod 5 − 2)/2)
    generated identically on both engines; the contraction shuffles
    on (vec_id, out_dim) with map-side partial sums, and the
    (64×4-row) weight side is broadcast.
  * new_users_curve_events — daily new-user counts and the running
    cumulative distinct-user curve: first-seen-day per user (one hash
    agg), then a day-count-sized cumulative window — the growth
    report that sidesteps COUNT(DISTINCT) over a running frame
    entirely (pairs with rolling_distinct_users, which solves the
    windowed variant by spine join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- relational GEMM: embeddings × deterministic 64x4 projection -----------
_MATMUL_SQL = """
    WITH e AS (
      SELECT vec_id, k - 1 AS k, CAST(embedding[CAST(k AS INT)] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(k)
      WHERE vec_id < 100
    ),
    w AS (
      SELECT k, j, (((k * 7 + j * 3) % 5) - 2) / 2.0 AS wt
      FROM unnest(range(0, 64)) AS a(k), unnest(range(0, 4)) AS b(j)
    )
    SELECT e.vec_id, w.j AS out_dim,
           round(sum(e.v * w.wt), 6) AS value
    FROM e JOIN w ON e.k = w.k
    GROUP BY e.vec_id, w.j
"""


@register("matmul_embeddings", _MATMUL_SQL)
def matmul_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id", F.posexplode("embedding").alias("k", "v")
        )
        .select("vec_id", F.col("k").cast("long").alias("k"), F.col("v").cast("double").alias("v"))
    )
    ks = spark.range(0, 64).select(F.col("id").alias("k"))
    js = spark.range(0, 4).select(F.col("id").alias("j"))
    w = ks.crossJoin(js).select(
        "k", "j", (((F.col("k") * 7 + F.col("j") * 3) % 5 - 2) / 2.0).alias("wt")
    )
    return (
        e.join(F.broadcast(w), "k")
        .groupBy("vec_id", F.col("j").alias("out_dim"))
        .agg(F.round(F.sum(F.col("v") * F.col("wt")), 6).alias("value"))
    )


# --- daily new users + cumulative distinct curve ---------------------------
_NEWUSERS_SQL = """
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, count(*) AS n_new FROM first_seen GROUP BY d)
    SELECT d, n_new,
           CAST(sum(n_new) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
"""


@register("new_users_curve_events", _NEWUSERS_SQL)
def new_users_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("d"))
    )
    daily = first_seen.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select("d", "n_new", F.sum("n_new").over(w).alias("cum_users"))
