"""Sixty-seventh oracle-registry module: coreset selection and
distribution distance.

  * kcenter_embeddings — greedy k-center coreset selection: starting
    from vec 0, three unrolled farthest-point picks (argmax of the
    running min-distance-to-selected, squared distances rounded 6,
    vec_id tiebreak), emitting the selected centers and the coverage
    radius after each pick.  The active-learning / data-selection
    primitive: each round is one cross-join aggregate against the
    (tiny) selected set, so a round costs one scan however large the
    pool.

  * wasserstein_docs — 1-D Wasserstein-1 (earth mover's) distance
    between the en and de n_chars distributions, as the exact
    integral of |ECDF_a − ECDF_b| over the sorted union of values:
    the gap-weighted running-difference sum — the transport-cost
    complement of the KS statistic (sup-gap) and PSI (binned),
    computed by the same running-ECDF machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# kcenter_embeddings
# ---------------------------------------------------------------------------

_KC_N = 200
_KC_PICKS = 3


def _kcenter_sql() -> str:
    blocks = [
        f"""v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < {_KC_N}
    ),
    sel0(vec_id) AS (VALUES (CAST(0 AS BIGINT)))"""
    ]
    for r in range(1, _KC_PICKS + 1):
        p = r - 1
        blocks.append(
            f"""pair{r} AS (
      SELECT a.vec_id, s.vec_id AS sid,
             round(sum((a.emb[u.i] - s.emb[u.i]) * (a.emb[u.i] - s.emb[u.i])), 6) AS d2
      FROM v a
      JOIN (SELECT v.vec_id, v.emb FROM v JOIN sel{p} USING (vec_id)) s ON TRUE
      JOIN (SELECT unnest(range(1, 65)) AS i) u ON TRUE
      WHERE a.vec_id NOT IN (SELECT vec_id FROM sel{p})
      GROUP BY a.vec_id, s.vec_id
    ),
    d{r} AS (
      SELECT vec_id, MIN(d2) AS mind FROM pair{r} GROUP BY vec_id
    ),
    pick{r} AS (
      SELECT vec_id, mind FROM d{r}
      ORDER BY mind DESC, vec_id ASC LIMIT 1
    ),
    sel{r}(vec_id) AS (
      SELECT vec_id FROM sel{p} UNION ALL SELECT vec_id FROM pick{r}
    )"""
        )
    picks = " UNION ALL ".join(
        f"SELECT {r} AS pick_round, vec_id AS picked, round(sqrt(mind), 6) AS radius FROM pick{r}"
        for r in range(1, _KC_PICKS + 1)
    )
    return "WITH " + ",\n    ".join(blocks) + f"\n    {picks}"


@register("kcenter_embeddings", _kcenter_sql())
def kcenter_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _KC_N)
    v = e.select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb")
    )
    selected = [0]
    out_rows = []
    for r in range(1, _KC_PICKS + 1):
        sel = v.filter(F.col("vec_id").isin(selected)).select(
            F.col("vec_id").alias("sid"), F.col("emb").alias("semb")
        )
        d = (
            v.filter(~F.col("vec_id").isin(selected))
            .crossJoin(sel)
            .select(
                "vec_id",
                F.round(
                    F.aggregate(
                        F.zip_with(F.col("emb"), F.col("semb"), lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    ),
                    6,
                ).alias("d2"),
            )
            .groupBy("vec_id")
            .agg(F.min("d2").alias("mind"))
        )
        pick = d.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).collect()[0]
        selected.append(pick.vec_id)
        out_rows.append((r, pick.vec_id, round(pick.mind ** 0.5, 6)))
    return _t(spark, sf_dir, "embeddings").sparkSession.createDataFrame(
        out_rows, "pick_round int, picked long, radius double"
    )


# ---------------------------------------------------------------------------
# wasserstein_docs
# ---------------------------------------------------------------------------

_W1_SQL = """
    WITH a AS (SELECT n_chars AS x FROM documents WHERE lang = 'en'),
    b AS (SELECT n_chars AS x FROM documents WHERE lang = 'de'),
    na AS (SELECT COUNT(*) AS n FROM a),
    nb AS (SELECT COUNT(*) AS n FROM b),
    pooled AS (
      SELECT x, SUM(ca) AS ca, SUM(cb) AS cb FROM (
        SELECT x, 1 AS ca, 0 AS cb FROM a
        UNION ALL
        SELECT x, 0, 1 FROM b
      ) GROUP BY x
    ),
    ecdf AS (
      SELECT x,
             SUM(ca) OVER w * 1.0 / (SELECT n FROM na) AS fa,
             SUM(cb) OVER w * 1.0 / (SELECT n FROM nb) AS fb,
             lead(x) OVER (ORDER BY x) AS next_x
      FROM pooled
      WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ROUND(SUM(abs(fa - fb) * (next_x - x)), 6) AS w1_distance,
           (SELECT n FROM na) AS n_en,
           (SELECT n FROM nb) AS n_de
    FROM ecdf WHERE next_x IS NOT NULL
"""


@register("wasserstein_docs", _W1_SQL)
def wasserstein_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("lang") == "en").select(F.col("n_chars").alias("x"))
    b = d.filter(F.col("lang") == "de").select(F.col("n_chars").alias("x"))
    na = a.agg(F.count("*").alias("n_en"))
    nb = b.agg(F.count("*").alias("n_de"))
    pooled = (
        a.select("x", F.lit(1).alias("ca"), F.lit(0).alias("cb"))
        .unionByName(b.select("x", F.lit(0).alias("ca"), F.lit(1).alias("cb")))
        .groupBy("x")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = pooled.crossJoin(na).crossJoin(nb).select(
        "x",
        (F.sum("ca").over(w) * 1.0 / F.col("n_en")).alias("fa"),
        (F.sum("cb").over(w) * 1.0 / F.col("n_de")).alias("fb"),
        F.lead("x").over(Window.orderBy("x")).alias("next_x"),
        "n_en",
        "n_de",
    )
    return ecdf.filter(F.col("next_x").isNotNull()).agg(
        F.round(F.sum(F.abs(F.col("fa") - F.col("fb")) * (F.col("next_x") - F.col("x"))), 6).alias(
            "w1_distance"
        ),
        F.min("n_en").alias("n_en"),
        F.min("n_de").alias("n_de"),
    )
