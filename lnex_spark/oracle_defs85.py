"""Eighty-fifth oracle-registry module: backoff language-model scoring
and aggregation-reversal diagnostics.

  * stupid_backoff_docs — held-out scoring under the stupid-backoff
    bigram LM (Brants et al.'s web-scale recipe: no discounting —
    score = c(w1w2)/c(w1) when the bigram was seen in training, else
    0.4 * unigram probability with an add-one floor for OOV):
    train counts from the first 70% of doc_ids (scale-adaptive
    floor-division split), scores over the held-out 30%,
    per-language mean log-score and backoff rate.  Complements
    bigram_lm_score_docs (add-one interpolation) with the family
    actually used at corpus scale BECAUSE it is one join + one
    coalesce per token — no normalization pass over the vocabulary.

  * simpson_check_events — the Simpson's-paradox audit: pooled
    Pearson correlation of (value, hour-of-day) vs the same
    correlation within each event type, flagging types whose sign
    reverses the pooled story.  Raw-moment form on both engines,
    signs taken AFTER rounding so the flag is cross-engine exact.
    The one-query sanity check that belongs next to every pooled
    metric a dashboard reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SB_SQL = r"""
    WITH bounds AS (
      SELECT MAX(doc_id) AS mx FROM documents
    ),
    toks AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t,
             (doc_id * 10) // (b.mx + 1) < 7 AS in_train
      FROM documents, bounds b
    ),
    train_pairs AS (
      SELECT array_to_string(t[i:i+1], ' ') AS bg
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks
            WHERE in_train AND len(t) >= 2)
    ),
    c2 AS (SELECT bg, COUNT(*) AS c FROM train_pairs GROUP BY bg),
    train_toks AS (
      SELECT unnest(t) AS w FROM toks WHERE in_train
    ),
    c1 AS (SELECT w, COUNT(*) AS c FROM train_toks WHERE len(w) > 0 GROUP BY w),
    n AS (SELECT SUM(c) AS n_toks, COUNT(*) AS v FROM c1),
    test_pairs AS (
      SELECT lang, t[i] AS w1, t[i+1] AS w2, array_to_string(t[i:i+1], ' ') AS bg
      FROM (SELECT lang, t, unnest(range(1, len(t))) AS i FROM toks
            WHERE NOT in_train AND len(t) >= 2)
    ),
    scored AS (
      SELECT p.lang,
             CASE WHEN b.c IS NOT NULL
                  THEN ln(b.c * 1.0 / u1.c)
                  ELSE ln(0.4 * (COALESCE(u2.c, 0) + 1.0) / (n.n_toks + n.v)) END
               AS s,
             CASE WHEN b.c IS NULL THEN 1 ELSE 0 END AS backoff
      FROM test_pairs p
      LEFT JOIN c2 b ON p.bg = b.bg
      LEFT JOIN c1 u1 ON p.w1 = u1.w
      LEFT JOIN c1 u2 ON p.w2 = u2.w
      CROSS JOIN n
    )
    SELECT lang, COUNT(*) AS n_pairs,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           ROUND(AVG(s), 6) AS mean_logscore
    FROM scored GROUP BY lang
"""


@register("stupid_backoff_docs", _SB_SQL)
def stupid_backoff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bounds = d.agg(F.max("doc_id").alias("mx"))
    toks = d.crossJoin(bounds).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
        # floor division on both engines (DuckDB //, F.floor) — 70/30 split
        (F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)) < 7).alias("in_train"),
    )

    def pairs(df):
        return df.filter(F.size("t") >= 2).select(
            "lang",
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
            "t",
        ).select(
            "lang",
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
            F.array_join(F.slice("t", F.col("i"), 2), " ").alias("bg"),
        )

    train = toks.filter(F.col("in_train"))
    c2 = pairs(train).groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = (
        train.select(F.explode("t").alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    n = c1.agg(F.sum("c1").alias("n_toks"), F.count("*").alias("v"))
    test = pairs(toks.filter(~F.col("in_train")))
    scored = (
        test.join(c2, "bg", "left")
        .join(c1.select(F.col("w").alias("w1"), F.col("c1").alias("cw1")), "w1", "left")
        .join(c1.select(F.col("w").alias("w2"), F.col("c1").alias("cw2")), "w2", "left")
        .crossJoin(n)
        .select(
            "lang",
            F.when(
                F.col("c2").isNotNull(), F.log(F.col("c2") * 1.0 / F.col("cw1"))
            )
            .otherwise(
                F.log(
                    0.4
                    * (F.coalesce(F.col("cw2"), F.lit(0)) + 1.0)
                    / (F.col("n_toks") + F.col("v"))
                )
            )
            .alias("s"),
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("backoff"),
        )
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum("backoff").cast("long").alias("n_backoff"),
        F.round(F.avg("s"), 6).alias("mean_logscore"),
    )


_SIMPSON_SQL = """
    WITH base AS (
      SELECT event_type, value,
             CAST(date_part('hour', ts) AS DOUBLE) AS h
      FROM events
    ),
    pooled AS (
      SELECT (AVG(value * h) - AVG(value) * AVG(h))
             / sqrt((AVG(value * value) - AVG(value) * AVG(value))
                    * (AVG(h * h) - AVG(h) * AVG(h))) AS r_pooled
      FROM base
    ),
    per_type AS (
      SELECT event_type,
             COUNT(*) AS n,
             (AVG(value * h) - AVG(value) * AVG(h))
             / sqrt((AVG(value * value) - AVG(value) * AVG(value))
                    * (AVG(h * h) - AVG(h) * AVG(h))) AS r_type
      FROM base GROUP BY event_type
    )
    SELECT t.event_type, t.n,
           ROUND(t.r_type, 6) AS r_type,
           ROUND(p.r_pooled, 6) AS r_pooled,
           CAST(sign(ROUND(t.r_type, 6)) <> sign(ROUND(p.r_pooled, 6)) AS INTEGER)
             AS sign_reversal
    FROM per_type t, pooled p
"""


@register("simpson_check_events", _SIMPSON_SQL)
def simpson_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "value", F.hour("ts").cast("double").alias("h")
    )

    def corr_expr():
        return (
            F.avg(F.col("value") * F.col("h")) - F.avg("value") * F.avg("h")
        ) / F.sqrt(
            (F.avg(F.col("value") * F.col("value")) - F.avg("value") * F.avg("value"))
            * (F.avg(F.col("h") * F.col("h")) - F.avg("h") * F.avg("h"))
        )

    pooled = base.agg(corr_expr().alias("r_pooled"))
    per_type = base.groupBy("event_type").agg(
        F.count("*").alias("n"), corr_expr().alias("r_type")
    )
    return per_type.crossJoin(pooled).select(
        "event_type",
        "n",
        F.round("r_type", 6).alias("r_type"),
        F.round("r_pooled", 6).alias("r_pooled"),
        (F.signum(F.round("r_type", 6)) != F.signum(F.round("r_pooled", 6)))
        .cast("int")
        .alias("sign_reversal"),
    )
