"""Thirty-seventh oracle-registry module: dispersion, association
rules, robust means, and source profiling.

  * burstiness_events — Fano factor (variance/mean of daily counts)
    per event type: the dispersion diagnostic separating Poisson-like
    arrivals (≈1) from bursty ones (≫1) — with autocorrelation and
    the changepoint, the arrival-process triage of the monitoring
    suite.
  * assoc_rules_events — market-basket association rules over
    (user, hour) baskets of event types: support, confidence, and
    lift per directed type pair — two hash aggs and one basket-keyed
    self-join, the classic co-occurrence mining shape.
  * winsorized_mean_events — per-type winsorized mean with p05/p95
    bounds taken as exact ordered-row picks within each type (rank =
    ceil(q·n) under a fully-specified order) — the robust-mean twin
    of the MAD/z-score outlier ops; no quantile-type builtins, so
    both engines pick identical bound rows.
  * source_quality_profile — per-source corpus intake profile
    (doc count, length stats, language mix) — the first op keyed on
    the documents.source column, closing the last unused column of
    the driver schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- Fano factor per event type --------------------------------------------
_BURST_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, count(*) AS n_days,
           round(avg(c), 6) AS mean_daily,
           round(var_pop(c), 6) AS var_daily,
           round(var_pop(c) / avg(c), 6) AS fano
    FROM daily GROUP BY event_type
"""


@register("burstiness_events", _BURST_SQL)
def burstiness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("c"), 6).alias("mean_daily"),
        F.round(F.var_pop("c"), 6).alias("var_daily"),
        F.round(F.var_pop("c") / F.avg("c"), 6).alias("fano"),
    )


# --- association rules over (user, hour) baskets ---------------------------
_ASSOC_SQL = """
    WITH items AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS hb, event_type
      FROM events
    ),
    nb AS (SELECT count(DISTINCT (user_id, hb)) AS n_baskets FROM items),
    na AS (SELECT event_type, count(*) AS n FROM items GROUP BY 1),
    nab AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             count(*) AS n_both
      FROM items a JOIN items b
        ON a.user_id = b.user_id AND a.hb = b.hb
       AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT antecedent, consequent, n_both,
           round(n_both * 1.0 / nb.n_baskets, 6) AS support,
           round(n_both * 1.0 / na_a.n, 6) AS confidence,
           round((n_both * 1.0 / na_a.n) / (na_c.n * 1.0 / nb.n_baskets), 6)
             AS lift
    FROM nab
    JOIN na na_a ON na_a.event_type = antecedent
    JOIN na na_c ON na_c.event_type = consequent
    CROSS JOIN nb
"""


@register("assoc_rules_events", _ASSOC_SQL)
def assoc_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("hour", "ts").alias("hb"), "event_type")
        .distinct()
    )
    nb = items.select("user_id", "hb").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    na = items.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = items.alias("a"), items.alias("b")
    nab = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    out = (
        nab.join(
            F.broadcast(na.select(F.col("event_type").alias("antecedent"), F.col("n").alias("n_a"))),
            "antecedent",
        )
        .join(
            F.broadcast(na.select(F.col("event_type").alias("consequent"), F.col("n").alias("n_c"))),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
    )
    conf = F.col("n_both") * 1.0 / F.col("n_a")
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        F.round(F.col("n_both") * 1.0 / F.col("n_baskets"), 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(conf / (F.col("n_c") * 1.0 / F.col("n_baskets")), 6).alias("lift"),
    )


# --- winsorized mean per event type ----------------------------------------
_WINSOR_SQL = """
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT event_type,
             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                      THEN value END) AS v05,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN value END) AS v95,
             max(n) AS n
      FROM r GROUP BY event_type
    )
    SELECT r.event_type, bounds.n AS n_events,
           round(v05, 6) AS v05, round(v95, 6) AS v95,
           round(avg(CASE WHEN r.value < v05 THEN v05
                          WHEN r.value > v95 THEN v95
                          ELSE r.value END), 6) AS winsorized_mean
    FROM r JOIN bounds ON r.event_type = bounds.event_type
    GROUP BY r.event_type, bounds.n, v05, v95
"""


@register("winsorized_mean_events", _WINSOR_SQL)
def winsorized_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("long"), F.col("value")
            )
        ).alias("v05"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"), F.col("value")
            )
        ).alias("v95"),
        F.max("n").alias("n_events"),
    )
    j = r.drop("n").join(F.broadcast(bounds), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("v05"), F.col("v05"))
        .when(F.col("value") > F.col("v95"), F.col("v95"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type", "n_events", "v05", "v95").agg(
        F.round(F.avg(clipped), 6).alias("winsorized_mean")
    ).select(
        "event_type",
        "n_events",
        F.round("v05", 6).alias("v05"),
        F.round("v95", 6).alias("v95"),
        "winsorized_mean",
    )


# --- per-source intake profile ---------------------------------------------
_SOURCE_SQL = """
    SELECT source, count(*) AS n_docs,
           round(avg(n_chars), 6) AS mean_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           count(DISTINCT lang) AS n_langs,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS en_share
    FROM documents GROUP BY source
"""


@register("source_quality_profile", _SOURCE_SQL)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) * 1.0 / F.count("*"),
            6,
        ).alias("en_share"),
    )
