"""Hundred-eighth oracle-registry module: corpus-comparison
attribution and online model evaluation.

  * fightin_words_docs — Monroe et al.'s "fightin' words": per-token
    log-odds difference between the en and de corpora under an
    informative Dirichlet prior (alpha = corpus-wide counts scaled
    to 100 pseudo-tokens), z-scored by the delta's approximate
    variance 1/(y_en+a) + 1/(y_de+a).  Where JSD says HOW different
    two corpora are, this says WHICH tokens carry the difference,
    with small-count terms properly shrunk — the per-token
    attribution step of every corpus-drift investigation.  Top-10
    |z| reported (rounded-z ranking, token tiebreak).

  * prequential_markov_events — prequential (test-then-train)
    evaluation of the order-1 next-type predictor: for each day d,
    the model is the cumulative-transition argmax trained on days
    < d, scored on day d's transitions.  Integer cumulative counts
    make every per-day argmax cross-engine exact; days with no
    training history fall out naturally (no prediction, excluded).
    The online-learning evaluation protocol — accuracy climbing
    from cold start day by day — in one relational pass: per-(s,t)
    day window cumsum, per-(s,day) argmax, join to next-day truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FW_SQL = r"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE lang IN ('en', 'de')
    ),
    cnt AS (
      SELECT tok,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y_en,
             SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS y_de
      FROM toks WHERE len(tok) > 0 GROUP BY tok
    ),
    tot AS (
      SELECT SUM(y_en) AS n_en, SUM(y_de) AS n_de,
             SUM(y_en) + SUM(y_de) AS n_all
      FROM cnt
    ),
    prior AS (
      SELECT c.tok, c.y_en, c.y_de,
             100.0 * (c.y_en + c.y_de) / t.n_all AS a,
             t.n_en, t.n_de
      FROM cnt c CROSS JOIN tot t
    ),
    scored AS (
      SELECT tok, y_en, y_de,
             ln((y_en + a) / (n_en + 100.0 - y_en - a))
               - ln((y_de + a) / (n_de + 100.0 - y_de - a)) AS delta,
             sqrt(1.0 / (y_en + a) + 1.0 / (y_de + a)) AS sd
      FROM prior
    ),
    z AS (
      SELECT tok, CAST(y_en AS BIGINT) AS y_en, CAST(y_de AS BIGINT) AS y_de,
             ROUND(delta / sd, 6) AS zscore
      FROM scored
    )
    SELECT rk, tok, y_en, y_de, zscore FROM (
      SELECT *, row_number() OVER (ORDER BY abs(zscore) DESC, tok) AS rk FROM z
    ) WHERE rk <= 10
"""


@register("fightin_words_docs", _FW_SQL)
def fightin_words_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    cnt = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("y_en"),
            F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("y_de"),
        )
    )
    tot = cnt.agg(
        F.sum("y_en").alias("n_en"),
        F.sum("y_de").alias("n_de"),
        (F.sum("y_en") + F.sum("y_de")).alias("n_all"),
    )
    prior = cnt.crossJoin(tot).select(
        "tok",
        "y_en",
        "y_de",
        (100.0 * (F.col("y_en") + F.col("y_de")) / F.col("n_all")).alias("a"),
        "n_en",
        "n_de",
    )
    delta = F.log(
        (F.col("y_en") + F.col("a"))
        / (F.col("n_en") + 100.0 - F.col("y_en") - F.col("a"))
    ) - F.log(
        (F.col("y_de") + F.col("a"))
        / (F.col("n_de") + 100.0 - F.col("y_de") - F.col("a"))
    )
    sd = F.sqrt(1.0 / (F.col("y_en") + F.col("a")) + 1.0 / (F.col("y_de") + F.col("a")))
    z = prior.select(
        "tok",
        F.col("y_en").cast("long").alias("y_en"),
        F.col("y_de").cast("long").alias("y_de"),
        F.round(delta / sd, 6).alias("zscore"),
    )
    # vocabulary-sized global window
    w = Window.orderBy(F.abs(F.col("zscore")).desc(), F.asc("tok"))
    return (
        z.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("rk", "tok", "y_en", "y_de", "zscore")
    )


_PREQ_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    trans AS (
      SELECT s, t, day, COUNT(*) AS c
      FROM ordered WHERE t IS NOT NULL GROUP BY s, t, day
    ),
    days AS (SELECT DISTINCT day FROM trans),
    pairs AS (SELECT DISTINCT s, t FROM trans),
    spine AS (
      SELECT p.s, p.t, d.day, COALESCE(tr.c, 0) AS c
      FROM pairs p CROSS JOIN days d
      LEFT JOIN trans tr ON tr.s = p.s AND tr.t = p.t AND tr.day = d.day
    ),
    cum AS (
      SELECT s, t, day,
             SUM(c) OVER (PARTITION BY s, t ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS c_before
      FROM spine
    ),
    model AS (
      SELECT s, day, t AS pred FROM (
        SELECT s, t, day, c_before,
               row_number() OVER (PARTITION BY s, day
                   ORDER BY c_before DESC, t) AS rk
        FROM cum WHERE c_before IS NOT NULL AND c_before > 0
      ) WHERE rk = 1
    ),
    evald AS (
      SELECT o.day,
             CASE WHEN m.pred = o.t THEN 1 ELSE 0 END AS hit
      FROM ordered o JOIN model m ON m.s = o.s AND m.day = o.day
      WHERE o.t IS NOT NULL
    )
    SELECT day, COUNT(*) AS n_eval,
           CAST(SUM(hit) AS BIGINT) AS n_hits,
           ROUND(AVG(hit * 1.0), 6) AS accuracy
    FROM evald GROUP BY day
"""


@register("prequential_markov_events", _PREQ_SQL)
def prequential_markov_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).filter(F.col("t").isNotNull())
    trans = ordered.groupBy("s", "t", "day").agg(F.count("*").alias("c"))
    days = trans.select("day").distinct()
    pairs = trans.select("s", "t").distinct()
    spine = (
        pairs.crossJoin(days)
        .join(trans.withColumnRenamed("c", "tc"), ["s", "t", "day"], "left")
        .select("s", "t", "day", F.coalesce(F.col("tc"), F.lit(0)).alias("c"))
    )
    wcum = (
        Window.partitionBy("s", "t")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = spine.select("s", "t", "day", F.sum("c").over(wcum).alias("c_before"))
    wrk = Window.partitionBy("s", "day").orderBy(F.desc("c_before"), F.asc("t"))
    model = (
        cum.filter(F.col("c_before").isNotNull() & (F.col("c_before") > 0))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select("s", "day", F.col("t").alias("pred"))
    )
    evald = ordered.join(model, ["s", "day"]).select(
        "day", F.when(F.col("pred") == F.col("t"), 1).otherwise(0).alias("hit")
    )
    return evald.groupBy("day").agg(
        F.count("*").alias("n_eval"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.round(F.avg(F.col("hit") * 1.0), 6).alias("accuracy"),
    )
