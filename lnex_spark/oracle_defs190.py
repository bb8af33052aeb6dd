"""Hundred-ninetieth oracle-registry module: training-mixture design
— the two reweighting schemes an LLM data pipeline applies before
sampling a corpus.

  * temperature_mixing_docs — temperature-scaled source sampling
    weights w_s ∝ n_s^tau for tau in {0.3, 0.5, 0.7, 1.0} over the
    documents sources, with each temperature's mixture Shannon
    entropy and effective source count exp(H).  tau = 1 reproduces
    natural proportions, tau → 0 approaches uniform — the
    multilingual-sampling knob (mT5/XLM-R style) that trades
    head-source dominance against tail-source upweighting; the
    entropy column is the one-number summary of that trade.

  * effective_samples_docs — class-balanced weights by effective
    number of samples (Cui et al. 2019) over the lang classes:
    E_n = (1 - beta^n)/(1 - beta) for beta in {0.99, 0.999,
    0.9999}, class weight ∝ 1/E_n normalized to sum to the class
    count.  As beta → 1 this recovers inverse-frequency weighting,
    small beta → uniform — the principled interpolation that
    replaces ad-hoc 1/n class weights (cross-check:
    class_weights_embeddings does plain inverse frequency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TEMP_SQL = """
    WITH src AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    taus AS (SELECT CAST(UNNEST([0.3, 0.5, 0.7, 1.0]) AS DOUBLE) AS tau),
    scaled AS (
      SELECT t.tau, s.source, s.n,
             POW(s.n, t.tau) AS raw
      FROM src s CROSS JOIN taus t
    ),
    norm AS (
      SELECT tau, source, n,
             raw / SUM(raw) OVER (PARTITION BY tau) AS w
      FROM scaled
    ),
    ent AS (
      SELECT tau,
             -SUM(w * LN(w)) AS h
      FROM norm GROUP BY tau
    )
    SELECT n.tau, n.source, CAST(n.n AS BIGINT) AS n_docs,
           ROUND(n.w, 6) AS weight,
           ROUND(e.h, 6) AS mixture_entropy,
           ROUND(EXP(e.h), 6) AS effective_sources
    FROM norm n JOIN ent e ON e.tau = n.tau
    ORDER BY n.tau, n.source
"""


@register("temperature_mixing_docs", _TEMP_SQL)
def temperature_mixing_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count("*").alias("n"))
    taus = d.sparkSession.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (1.0,)], "tau double"
    )
    scaled = src.crossJoin(F.broadcast(taus)).select(
        "tau", "source", "n", F.pow(F.col("n"), F.col("tau")).alias("raw")
    )
    wt = Window.partitionBy("tau")
    norm = scaled.select(
        "tau",
        "source",
        "n",
        (F.col("raw") / F.sum("raw").over(wt)).alias("w"),
    )
    ent = norm.groupBy("tau").agg(
        (-F.sum(F.col("w") * F.log("w"))).alias("h")
    )
    return (
        norm.join(F.broadcast(ent), "tau")
        .select(
            "tau",
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.round("w", 6).alias("weight"),
            F.round("h", 6).alias("mixture_entropy"),
            F.round(F.exp("h"), 6).alias("effective_sources"),
        )
        .orderBy("tau", "source")
    )


_EFF_SQL = """
    WITH cls AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    betas AS (
      SELECT CAST(UNNEST([0.99, 0.999, 0.9999]) AS DOUBLE) AS beta
    ),
    eff AS (
      SELECT b.beta, c.lang, c.n,
             (1 - POW(b.beta, c.n)) / (1 - b.beta) AS en
      FROM cls c CROSS JOIN betas b
    ),
    norm AS (
      SELECT beta, lang, n, en,
             (1 / en) / SUM(1 / en) OVER (PARTITION BY beta)
               * COUNT(*) OVER (PARTITION BY beta) AS w
      FROM eff
    )
    SELECT beta, lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(en, 4) AS effective_n,
           ROUND(w, 6) AS class_weight
    FROM norm
    ORDER BY beta, lang
"""


@register("effective_samples_docs", _EFF_SQL)
def effective_samples_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cls = d.groupBy("lang").agg(F.count("*").alias("n"))
    betas = d.sparkSession.createDataFrame(
        [(0.99,), (0.999,), (0.9999,)], "beta double"
    )
    eff = cls.crossJoin(F.broadcast(betas)).select(
        "beta",
        "lang",
        "n",
        ((1 - F.pow(F.col("beta"), F.col("n"))) / (1 - F.col("beta"))).alias(
            "en"
        ),
    )
    wb = Window.partitionBy("beta")
    norm = eff.select(
        "beta",
        "lang",
        "n",
        "en",
        (
            (1 / F.col("en"))
            / F.sum(1 / F.col("en")).over(wb)
            * F.count("*").over(wb)
        ).alias("w"),
    )
    return norm.select(
        "beta",
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round("en", 4).alias("effective_n"),
        F.round("w", 6).alias("class_weight"),
    ).orderBy("beta", "lang")
