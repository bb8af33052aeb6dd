"""Fifty-sixth oracle-registry module: conversion attribution and
readability scoring.

  * attribution_events — first-touch vs last-touch conversion
    attribution: for every purchase, the last-touch channel is the
    user's most recent NON-purchase event type strictly before it
    (last_value IGNORE NULLS over a (UNBOUNDED, 1 PRECEDING) frame —
    the dialect-split spelling proven by locf_fill_events), the
    first-touch channel the first event of the user's history up to
    the purchase.  Emits conversions per (model, channel) — the
    marketing-attribution twin of the funnel op, one keyed window
    pass, no self-join against the event history.

  * readability_docs — per-language Flesch reading-ease under a
    deterministic vowel-group syllable proxy ([aeiouy]+ runs) and
    sentence count from [.!?]+ runs (floored at 1 — the corpus is
    unpunctuated prose), words from whitespace tokens.  The
    readability signal of a text-quality funnel; all counts via
    regexp_extract_all on both engines, one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ATTR_TEMPLATE = """
    WITH ordered AS (
      SELECT event_type,
             {lv} OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
             first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
      FROM events
    ),
    conv AS (
      SELECT COALESCE(last_touch, '(none)') AS last_touch, first_touch
      FROM ordered WHERE event_type = 'purchase'
    )
    SELECT model, channel, COUNT(*) AS conversions FROM (
      SELECT 'last_touch' AS model, last_touch AS channel FROM conv
      UNION ALL
      SELECT 'first_touch', first_touch FROM conv
    ) GROUP BY model, channel
"""

_NONPURCHASE = "CASE WHEN event_type <> 'purchase' THEN event_type END"


@register(
    "attribution_events",
    _ATTR_TEMPLATE.format(lv=f"last_value({_NONPURCHASE} IGNORE NULLS)"),
)
def attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _ATTR_TEMPLATE.format(lv=f"last_value({_NONPURCHASE}) IGNORE NULLS")
    )


_READ_SQL = r"""
    WITH feats AS (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)) AS words,
             GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(words * 1.0), 6) AS avg_words,
           ROUND(AVG(syllables * 1.0 / words), 6) AS avg_syll_per_word,
           ROUND(AVG(206.835 - 1.015 * (words * 1.0 / sentences)
                     - 84.6 * (syllables * 1.0 / words)), 6) AS avg_flesch
    FROM feats WHERE words > 0
    GROUP BY lang
"""


@register("readability_docs", _READ_SQL)
def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
        )
    )
    sentences = F.greatest(F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)))
    syllables = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0))
    feats = d.select(
        "lang",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    ).filter(F.col("words") > 0)
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("words") * 1.0), 6).alias("avg_words"),
        F.round(F.avg(F.col("syllables") * 1.0 / F.col("words")), 6).alias("avg_syll_per_word"),
        F.round(
            F.avg(
                206.835
                - 1.015 * (F.col("words") * 1.0 / F.col("sentences"))
                - 84.6 * (F.col("syllables") * 1.0 / F.col("words"))
            ),
            6,
        ).alias("avg_flesch"),
    )
