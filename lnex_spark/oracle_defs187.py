"""Hundred-eighty-seventh oracle-registry module: frequency-spectrum
vocabulary constants and service-level inventory sizing.

  * vocab_richness_docs — the classical vocabulary-richness
    constants per source, all from the word-frequency spectrum
    V(m) = #types occurring m times: Yule's K = 1e4 (sum m^2 V(m)
    - N)/N^2 (repeat-rate, length-invariant), Sichel's S = V(2)/V
    (dis-legomena share), and Honore's R = 100 ln N / (1 - V(1)/V)
    (hapax-driven).  Three different functionals of the same
    spectrum — a source whose K says "repetitive" while R says
    "hapax-rich" is template text with injected noise, a pattern
    lexical_diversity_docs' plain TTR cannot separate.

  * base_stock_events — base-stock (order-up-to) service-level
    table: lead-time demand ~ Poisson(lambda) with lambda = purchase
    events per 6-hour lead time, P(D <= S) for S on a grid around
    lambda via the log-factorial series p_k = exp(k ln lambda -
    sum ln j - lambda) accumulated by one window scan (the
    erlang_b_events trick).  Read off the smallest S with service
    >= 95%: that's the stock level; the demand-side twin of the
    Erlang sizing ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_LEAD_S = 6 * 3600.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_VOCAB_SQL = """
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
    freq AS (
      SELECT source, tok, COUNT(*) AS m FROM clean GROUP BY source, tok
    ),
    spectrum AS (
      SELECT source, m, COUNT(*) AS vm FROM freq GROUP BY source, m
    ),
    stats AS (
      SELECT source,
             SUM(CAST(m AS DOUBLE) * vm) AS n,
             SUM(vm) AS v,
             SUM(CAST(m AS DOUBLE) * m * vm) AS sm2,
             SUM(CASE WHEN m = 1 THEN vm ELSE 0 END) AS v1,
             SUM(CASE WHEN m = 2 THEN vm ELSE 0 END) AS v2
      FROM spectrum GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS n_types,
           ROUND(10000 * (sm2 - n) / (n * n), 6) AS yule_k,
           ROUND(CAST(v2 AS DOUBLE) / v, 6) AS sichel_s,
           ROUND(CASE WHEN v1 < v
                      THEN 100 * LN(n) / (1 - CAST(v1 AS DOUBLE) / v) END, 6)
             AS honore_r
    FROM stats
    ORDER BY source
"""


@register("vocab_richness_docs", _VOCAB_SQL)
def vocab_richness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    freq = clean.groupBy("source", "tok").agg(F.count("*").alias("m"))
    spectrum = freq.groupBy("source", "m").agg(F.count("*").alias("vm"))
    stats = spectrum.groupBy("source").agg(
        F.sum(F.col("m").cast("double") * F.col("vm")).alias("n"),
        F.sum("vm").alias("v"),
        F.sum(F.col("m").cast("double") * F.col("m") * F.col("vm")).alias(
            "sm2"
        ),
        F.sum(F.when(F.col("m") == 1, F.col("vm")).otherwise(0)).alias("v1"),
        F.sum(F.when(F.col("m") == 2, F.col("vm")).otherwise(0)).alias("v2"),
    )
    return stats.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("n_types"),
        F.round(
            10000 * (F.col("sm2") - F.col("n")) / (F.col("n") * F.col("n")), 6
        ).alias("yule_k"),
        F.round(F.col("v2").cast("double") / F.col("v"), 6).alias("sichel_s"),
        F.round(
            F.when(
                F.col("v1") < F.col("v"),
                100
                * F.log("n")
                / (1 - F.col("v1").cast("double") / F.col("v")),
            ),
            6,
        ).alias("honore_r"),
    ).orderBy("source")


_BASE_STOCK_SQL = f"""
    WITH arr AS (
      SELECT COUNT(*) AS n,
             (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0 AS span
      FROM events WHERE event_type = 'purchase'
    ),
    lam AS (
      SELECT ROUND(n / span * {_LEAD_S!r}, 6) AS lam FROM arr
    ),
    grid AS (
      SELECT UNNEST(range(0, 2 * CAST(CEIL((SELECT lam FROM lam)) AS BIGINT)
                             + 10)) AS k
    ),
    summand AS (
      SELECT k,
             CASE WHEN k = 0 THEN 0.0
                  ELSE LN((SELECT lam FROM lam) / k) END AS lnterm
      FROM grid
    ),
    pk AS (
      SELECT k,
             EXP(SUM(lnterm) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - (SELECT lam FROM lam)) AS p
      FROM summand
    ),
    cdf AS (
      SELECT k AS s,
             SUM(p) OVER (ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS service
      FROM pk
    )
    SELECT CAST(s AS BIGINT) AS stock_level,
           ROUND((SELECT lam FROM lam), 6) AS lead_demand,
           ROUND(service, 6) AS service_level
    FROM cdf
    WHERE service < 0.999 OR s <= CEIL((SELECT lam FROM lam))
    ORDER BY stock_level
"""


@register("base_stock_events", _BASE_STOCK_SQL)
def base_stock_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    arr = ev.agg(
        F.count("*").alias("n"),
        ((F.max(us) - F.min(us)) / 1000000.0).alias("span"),
    )
    lam_df = arr.select(
        F.round(F.col("n") / F.col("span") * _LEAD_S, 6).alias("lam")
    )
    lam = lam_df.collect()[0]["lam"]
    import math

    kmax = 2 * int(math.ceil(lam)) + 10
    grid = ev.sparkSession.range(0, kmax).select(F.col("id").alias("k"))
    wc = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    summand = grid.crossJoin(F.broadcast(lam_df)).select(
        "k",
        F.when(F.col("k") == 0, 0.0)
        .otherwise(F.log(F.col("lam") / F.when(F.col("k") != 0, F.col("k"))))
        .alias("lnterm"),
        "lam",
    )
    pk = summand.select(
        "k",
        F.exp(F.sum("lnterm").over(wc) - F.col("lam")).alias("p"),
        "lam",
    )
    cdf = pk.select(
        F.col("k").alias("s"),
        F.sum("p").over(wc).alias("service"),
        "lam",
    )
    return (
        cdf.where(
            (F.col("service") < 0.999)
            | (F.col("s") <= F.ceil(F.col("lam")))
        )
        .select(
            F.col("s").cast("long").alias("stock_level"),
            F.round("lam", 6).alias("lead_demand"),
            F.round("service", 6).alias("service_level"),
        )
        .orderBy("stock_level")
    )
