"""Ninety-first oracle-registry module: sequence predictability and
embedding-space collapse.

  * entropy_rate_events — the entropy rate of the order-1 Markov
    chain over per-user event-type streams: H = Σ_s π(s)·H(next|s)
    with the empirical from-state distribution as π and per-state
    conditional entropies from exact transition counts.  The single
    number that says how predictable user behavior is one step out —
    the information-theoretic summary of the role_transitions /
    markov_backtest machinery (0 = deterministic chain,
    log2(k) = uniform noise).  Bits, base-2.

  * participation_ratio_embeddings — the participation ratio
    PR = (Σv_d)²/Σv_d² over per-dimension variances of the embedding
    columns (raw-moment form via posexplode, one (dim)-keyed hash
    agg whose shuffle is dims-sized, independent of row count).
    The diagonal-only effective-dimensionality proxy an embedding
    pipeline watches for representation collapse: PR ≈ dims means
    variance is spread; PR ≈ 1 means the space has collapsed onto
    one axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ER_SQL = """
    WITH ordered AS (
      SELECT event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS nxt
      FROM events
    ),
    trans AS (
      SELECT s, nxt, COUNT(*) AS c FROM ordered WHERE nxt IS NOT NULL GROUP BY s, nxt
    ),
    marg AS (SELECT s, SUM(c) AS cs FROM trans GROUP BY s),
    tot AS (SELECT SUM(cs) AS n FROM marg),
    cond_h AS (
      SELECT t.s,
             SUM(-(t.c * 1.0 / m.cs) * ln(t.c * 1.0 / m.cs) / ln(2.0)) AS h_s
      FROM trans t JOIN marg m ON t.s = m.s
      GROUP BY t.s
    )
    SELECT CAST((SELECT COUNT(*) FROM marg) AS BIGINT) AS n_states,
           ROUND(SUM((m.cs * 1.0 / o.n) * ch.h_s), 6) AS entropy_rate_bits,
           ROUND(MAX(ln((SELECT COUNT(*) FROM marg) * 1.0) / ln(2.0)), 6)
             AS max_entropy_bits
    FROM cond_h ch JOIN marg m ON ch.s = m.s CROSS JOIN tot o
"""


@register("entropy_rate_events", _ER_SQL)
def entropy_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("nxt")
    )
    trans = (
        ordered.filter(F.col("nxt").isNotNull())
        .groupBy("s", "nxt")
        .agg(F.count("*").alias("c"))
    )
    marg = trans.groupBy("s").agg(F.sum("c").alias("cs"))
    tot = marg.agg(F.sum("cs").alias("n"))
    n_states = marg.agg(F.count("*").alias("k"))
    p = F.col("c") * 1.0 / F.col("cs")
    cond_h = (
        trans.join(marg, "s")
        .groupBy("s")
        .agg(F.sum(-p * F.log(p) / F.log(F.lit(2.0))).alias("h_s"))
    )
    return (
        cond_h.join(marg, "s")
        .crossJoin(tot)
        .crossJoin(n_states)
        .agg(
            F.max("k").cast("long").alias("n_states"),
            F.round(
                F.sum((F.col("cs") * 1.0 / F.col("n")) * F.col("h_s")), 6
            ).alias("entropy_rate_bits"),
            F.round(
                F.max(F.log(F.col("k") * 1.0) / F.log(F.lit(2.0))), 6
            ).alias("max_entropy_bits"),
        )
    )


_PR_SQL = """
    WITH idx AS (
      SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings WHERE vec_id < 2000
    ),
    dims AS (
      SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM idx
    ),
    per_dim AS (
      SELECT dim, AVG(x * x) - AVG(x) * AVG(x) AS v
      FROM dims GROUP BY dim
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(SUM(v), 6) AS total_var,
           ROUND(SUM(v) * SUM(v) / SUM(v * v), 6) AS participation_ratio
    FROM per_dim
"""


@register("participation_ratio_embeddings", _PR_SQL)
def participation_ratio_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    dims = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    per_dim = dims.groupBy("dim").agg(
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("v")
    )
    return per_dim.agg(
        F.count("*").cast("long").alias("n_dims"),
        F.round(F.sum("v"), 6).alias("total_var"),
        F.round(F.sum("v") * F.sum("v") / F.sum(F.col("v") * F.col("v")), 6).alias(
            "participation_ratio"
        ),
    )
