"""Hundred-second oracle-registry module: chain mixing speed and term
concentration.

  * markov_spectral_gap_events — the second eigenvalue of the
    empirical event-type transition matrix by three power-iteration
    rounds deflated against the all-ones right eigenvector (P·1 = 1
    for a row-stochastic matrix, so centering each iterate removes
    the lambda=1 component): per-round center → matrix-vector join →
    normalize → ROUND (the same round-each-iteration determinism as
    pca_power/spectral_cut).  lambda2 and the spectral gap 1−lambda2
    bound how fast user behavior forgets its starting state — the
    mixing-time diagnostic for anything that assumes stationarity
    (the entropy-rate and reach ops do).

  * term_burstiness_docs — Church-Gale burstiness per token:
    collection frequency over document frequency (mean occurrences
    per containing doc), top-10 burstiest terms among those in ≥ 5
    docs (rounded ratio, token tiebreak).  Bursty terms violate the
    bag-of-words independence assumption — the IR statistic that
    says which terms need burst-aware weighting (BM25's tf
    saturation exists because of exactly these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sg_round(prev: str, cur: str) -> str:
    """One deflated power-iteration round as DuckDB CTEs:
    w = P*v -> center by mean  →  normalize  →  round."""
    return f"""
    mv_{cur} AS (
      SELECT p.s, SUM(p.p * {prev}.v) AS w
      FROM p JOIN {prev} ON p.t = {prev}.s GROUP BY p.s
    ),
    cen_{cur} AS (
      SELECT s, w - (SELECT AVG(w) FROM mv_{cur}) AS w FROM mv_{cur}
    ),
    nrm_{cur} AS (SELECT sqrt(SUM(w * w)) AS z FROM cen_{cur}),
    {cur} AS (
      SELECT c.s, ROUND(c.w / NULLIF(n.z, 0), 6) AS v
      FROM cen_{cur} c CROSS JOIN nrm_{cur} n
    )"""


_SG_SQL = f"""
    WITH ordered AS (
      SELECT event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
      FROM events
    ),
    trans AS (
      SELECT s, t, COUNT(*) AS c FROM ordered WHERE t IS NOT NULL GROUP BY s, t
    ),
    marg AS (SELECT s, SUM(c) AS cs FROM trans GROUP BY s),
    p AS (
      SELECT tr.s, tr.t, tr.c * 1.0 / m.cs AS p
      FROM trans tr JOIN marg m ON tr.s = m.s
    ),
    v0_raw AS (
      SELECT s, row_number() OVER (ORDER BY s) * 1.0 AS w FROM marg
    ),
    v0_cen AS (
      SELECT s, w - (SELECT AVG(w) FROM v0_raw) AS w FROM v0_raw
    ),
    v0_nrm AS (SELECT sqrt(SUM(w * w)) AS z FROM v0_cen),
    v0 AS (
      SELECT c.s, ROUND(c.w / n.z, 6) AS v FROM v0_cen c CROSS JOIN v0_nrm n
    ),
    {_sg_round("v0", "v1")},
    {_sg_round("v1", "v2")},
    {_sg_round("v2", "v3")},
    mv_final AS (
      SELECT p.s, SUM(p.p * v3.v) AS w FROM p JOIN v3 ON p.t = v3.s GROUP BY p.s
    ),
    lam AS (
      SELECT sqrt(SUM(w * w)) AS lambda2 FROM (
        SELECT s, w - (SELECT AVG(w) FROM mv_final) AS w FROM mv_final
      )
    )
    SELECT ROUND(lambda2, 6) AS lambda2,
           ROUND(1.0 - lambda2, 6) AS spectral_gap
    FROM lam
"""


@register("markov_spectral_gap_events", _SG_SQL)
def markov_spectral_gap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    )
    trans = (
        ordered.filter(F.col("t").isNotNull()).groupBy("s", "t").agg(F.count("*").alias("c"))
    )
    marg = trans.groupBy("s").agg(F.sum("c").alias("cs"))
    p = trans.join(marg, "s").select(
        "s", "t", (F.col("c") * 1.0 / F.col("cs")).alias("p")
    )

    def center_norm_round(df: DataFrame) -> DataFrame:
        cen = df.crossJoin(df.agg(F.avg("w").alias("mw"))).select(
            "s", (F.col("w") - F.col("mw")).alias("w")
        )
        nrm = cen.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("z"))
        return cen.crossJoin(nrm).select(
            "s",
            F.round(F.col("w") / F.nullif(F.col("z"), F.lit(0.0)), 6).alias("v"),
        )

    v = center_norm_round(
        marg.select(
            "s", F.row_number().over(Window.orderBy("s")).cast("double").alias("w")
        )
    )
    def matvec(vec: DataFrame) -> DataFrame:
        return (
            p.join(vec.select(F.col("s").alias("t2"), "v"), p["t"] == F.col("t2"))
            .groupBy("s")
            .agg(F.sum(F.col("p") * F.col("v")).alias("w"))
        )

    for _ in range(3):
        v = center_norm_round(matvec(v))
    final_mv = matvec(v)
    cen = final_mv.crossJoin(final_mv.agg(F.avg("w").alias("mw"))).select(
        (F.col("w") - F.col("mw")).alias("w")
    )
    lam = cen.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("lambda2"))
    return lam.select(
        F.round("lambda2", 6).alias("lambda2"),
        F.round(1.0 - F.col("lambda2"), 6).alias("spectral_gap"),
    )


_TB_SQL = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT tok, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
      FROM toks WHERE len(tok) > 0 GROUP BY tok
    ),
    scored AS (
      SELECT tok, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
             ROUND(cf * 1.0 / df, 6) AS burstiness
      FROM cnt WHERE df >= 5
    )
    SELECT rk, tok, cf, df, burstiness FROM (
      SELECT *, row_number() OVER (ORDER BY burstiness DESC, tok) AS rk FROM scored
    ) WHERE rk <= 10
"""


@register("term_burstiness_docs", _TB_SQL)
def term_burstiness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df"))
    )
    scored = cnt.filter(F.col("df") >= 5).select(
        "tok",
        F.col("cf").cast("long").alias("cf"),
        F.col("df").cast("long").alias("df"),
        F.round(F.col("cf") * 1.0 / F.col("df"), 6).alias("burstiness"),
    )
    # vocabulary-sized global window
    w = Window.orderBy(F.desc("burstiness"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("rk", "tok", "cf", "df", "burstiness")
    )
