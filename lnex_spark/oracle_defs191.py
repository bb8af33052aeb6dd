"""Hundred-ninety-first oracle-registry module: training-time privacy
accounting and generation-time provenance detection — both sides of
the "what did the model absorb / emit" ledger.

  * dp_sgd_accounting_docs — simplified RDP accountant for DP-SGD
    over this corpus: sampling rate q = 32 / N docs, steps T = 3
    epochs x N/32, subsampled-Gaussian RDP per step approximated by
    the standard small-q bound q^2 alpha / sigma^2, composed
    linearly over T and converted at delta = 1/N via eps =
    min_alpha (T q^2 alpha / sigma^2 + ln(1/delta)/(alpha - 1)),
    alpha on the grid 2..64, for noise multipliers sigma in
    {0.5, 1, 2, 4}.  The sigma → epsilon table is the privacy
    budget sheet a DP training run publishes; the argmin alpha is
    emitted for auditability.

  * watermark_detect_docs — unigram (green-list) watermark
    detector: the green list is the md5-even half of the vocabulary
    (gamma = 0.5 expected), per document z = (g - n gamma) /
    sqrt(n gamma (1-gamma)) over its tokens, flagging z > 4 and
    reporting the corpus flag rate.  The Kirchenbauer-style
    detection arithmetic — on unwatermarked text the flag rate
    must match the false-positive budget, which this corpus
    verifies (a planted-watermark fixture would flip it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_BATCH = 32.0
_EPOCHS = 3.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DPSGD_SQL = f"""
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    params AS (
      SELECT n, {_BATCH!r} / n AS q,
             {_EPOCHS!r} * n / {_BATCH!r} AS t,
             LN(n) AS ln_inv_delta
      FROM n
    ),
    sigmas AS (SELECT CAST(UNNEST([0.5, 1.0, 2.0, 4.0]) AS DOUBLE) AS s),
    alphas AS (SELECT CAST(UNNEST(range(2, 65)) AS DOUBLE) AS a),
    eps AS (
      SELECT s.s, a.a,
             p.t * p.q * p.q * a.a / (s.s * s.s)
               + p.ln_inv_delta / (a.a - 1) AS e
      FROM sigmas s CROSS JOIN alphas a CROSS JOIN params p
    ),
    best AS (
      SELECT s, MIN(e) AS eps FROM eps GROUP BY s
    ),
    arg AS (
      SELECT e.s, MIN(e.a) AS alpha
      FROM eps e JOIN best b ON b.s = e.s AND e.e = b.eps
      GROUP BY e.s
    )
    SELECT b.s AS sigma,
           ROUND(b.eps, 6) AS epsilon,
           CAST(a.alpha AS BIGINT) AS best_alpha,
           ROUND((SELECT q FROM params), 9) AS q,
           CAST(FLOOR((SELECT t FROM params)) AS BIGINT) AS steps
    FROM best b JOIN arg a ON a.s = b.s
    ORDER BY sigma
"""


@register("dp_sgd_accounting_docs", _DPSGD_SQL)
def dp_sgd_accounting_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n = float(d.count())
    params = d.sparkSession.createDataFrame(
        [(n, _BATCH / n, _EPOCHS * n / _BATCH)], "n double, q double, t double"
    ).withColumn("ln_inv_delta", F.log("n"))
    sigmas = d.sparkSession.createDataFrame(
        [(0.5,), (1.0,), (2.0,), (4.0,)], "s double"
    )
    alphas = d.sparkSession.range(2, 65).select(
        F.col("id").cast("double").alias("a")
    )
    eps = (
        sigmas.crossJoin(F.broadcast(alphas))
        .crossJoin(F.broadcast(params))
        .select(
            "s",
            "a",
            (
                F.col("t") * F.col("q") * F.col("q") * F.col("a")
                / (F.col("s") * F.col("s"))
                + F.col("ln_inv_delta") / (F.col("a") - 1)
            ).alias("e"),
            "q",
            "t",
        )
    )
    best = eps.groupBy("s").agg(
        F.min("e").alias("eps"), F.max("q").alias("q"), F.max("t").alias("t")
    )
    arg = (
        eps.select("s", "a", "e")
        .join(
            best.select("s", F.col("eps").alias("e")), ["s", "e"]
        )
        .groupBy("s")
        .agg(F.min("a").alias("alpha"))
    )
    return (
        best.join(arg, "s")
        .select(
            F.col("s").alias("sigma"),
            F.round("eps", 6).alias("epsilon"),
            F.col("alpha").cast("long").alias("best_alpha"),
            F.round("q", 9).alias("q"),
            F.col("t").cast("long").alias("steps"),
        )
        .orderBy("sigma")
    )


_WATERMARK_SQL = """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    clean AS (
      SELECT doc_id, tok,
             CASE WHEN CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER)
                       % 2 = 0 THEN 1 ELSE 0 END AS green
      FROM toks WHERE tok <> ''
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n, SUM(green) AS g
      FROM clean GROUP BY doc_id
    ),
    z AS (
      SELECT doc_id, n, g,
             (g - n * 0.5) / SQRT(n * 0.25) AS z
      FROM per_doc WHERE n >= 10
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(CAST(g AS DOUBLE) / n), 6) AS mean_green_frac,
           ROUND(AVG(z), 6) AS mean_z,
           ROUND(MAX(z), 6) AS max_z,
           CAST(SUM(CASE WHEN z > 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS flagged,
           ROUND(AVG(CASE WHEN z > 4 THEN 1.0 ELSE 0.0 END), 6)
             AS flag_rate
    FROM z
"""


@register("watermark_detect_docs", _WATERMARK_SQL)
def watermark_detect_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    green = F.when(
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"),
            F.lit(2),
        )
        == 0,
        1,
    ).otherwise(0)
    per_doc = clean.withColumn("green", green).groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("green").alias("g")
    )
    z = per_doc.where(F.col("n") >= 10).withColumn(
        "z",
        (F.col("g") - F.col("n") * 0.5) / F.sqrt(F.col("n") * 0.25),
    )
    return z.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg(F.col("g").cast("double") / F.col("n")), 6).alias(
            "mean_green_frac"
        ),
        F.round(F.avg("z"), 6).alias("mean_z"),
        F.round(F.max("z"), 6).alias("max_z"),
        F.sum(F.when(F.col("z") > 4, 1).otherwise(0))
        .cast("long")
        .alias("flagged"),
        F.round(
            F.avg(F.when(F.col("z") > 4, 1.0).otherwise(0.0)), 6
        ).alias("flag_rate"),
    )
