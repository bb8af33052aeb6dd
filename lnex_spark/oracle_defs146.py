"""Hundred-forty-sixth oracle-registry module: the two remaining
classic corpus-LM statistics — Kneser-Ney smoothing and Dunning's
log-likelihood collocation test.

  * kneser_ney_docs — held-out scoring under an interpolated
    Kneser-Ney bigram LM (D = 0.75): train counts from the first 70%
    of doc_ids (the same scale-adaptive floor-division split as
    stupid_backoff_docs), continuation probability
    P_cont(w2) = N1+(. w2) / B over distinct training bigram TYPES,
    P_KN(w2|w1) = (c(w1 w2) - D)/c(w1) + D * N1+(w1 .)/c(w1) * P_cont(w2)
    for seen contexts; unseen-context pairs fall back to a
    Laplace-floored continuation ((N1+(. w2) + 1)/(B + V + 1), which
    also covers unseen w2).  Per-language held-out pair count,
    unseen-context rate, and mean log-probability.  With add-one
    interpolation (bigram_lm_score_docs), Good-Turing
    (good_turing_docs) and stupid backoff (stupid_backoff_docs) this
    completes the standard smoothing family; KN is the one whose
    backoff mass is TYPE-based, the recipe modern tokenizer-level
    LMs descend from.

  * dunning_llr_docs — Dunning's log-likelihood-ratio collocation
    ranking over adjacent word pairs: the 2x2 contingency per bigram
    counts the bigram POSITIONS (rows: left word = w1 or not;
    columns: right word = w2 or not; N = total bigram tokens),
    LLR = 2 * sum k_ij ln(k_ij N / (r_i c_j)) with the 0 ln 0 = 0
    convention.  Restricted to bigrams seen >= 3 times, top 20 by
    (rounded LLR desc, bigram asc) so the ranking trajectory is
    cross-engine exact.  The variance-stable complement of
    pmi_copairs: PMI over-ranks rare pairs, LLR is the statistic
    collocation extraction actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_KN_SQL = r"""
    WITH bounds AS (SELECT MAX(doc_id) AS mx FROM documents),
    toks AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t,
             (doc_id * 10) // (b.mx + 1) < 7 AS in_train
      FROM documents, bounds b
    ),
    train_pairs AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks
            WHERE in_train AND len(t) >= 2)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM train_pairs GROUP BY w1, w2),
    cw1 AS (SELECT w1, SUM(c) AS c, COUNT(*) AS n_after FROM c2 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n_before FROM c2 GROUP BY w2),
    tot AS (
      SELECT (SELECT COUNT(*) FROM c2) AS b_types,
             (SELECT COUNT(DISTINCT w) FROM (
                SELECT w1 AS w FROM c2 UNION SELECT w2 FROM c2)) AS v
    ),
    test_pairs AS (
      SELECT lang, t[i] AS w1, t[i+1] AS w2
      FROM (SELECT lang, t, unnest(range(1, len(t))) AS i FROM toks
            WHERE NOT in_train AND len(t) >= 2)
    ),
    scored AS (
      SELECT p.lang,
             CASE WHEN u.c IS NULL THEN 1 ELSE 0 END AS unseen_ctx,
             CASE WHEN u.c IS NOT NULL THEN
               ln((COALESCE(b.c, 0) - CASE WHEN b.c IS NOT NULL
                                           THEN 0.75 ELSE 0.0 END) / u.c
                  + 0.75 * u.n_after / u.c
                    * ((COALESCE(k.n_before, 0) + 1.0)
                       / (t.b_types + t.v + 1.0)))
             ELSE
               ln((COALESCE(k.n_before, 0) + 1.0)
                  / (t.b_types + t.v + 1.0))
             END AS s
      FROM test_pairs p
      LEFT JOIN c2 b ON p.w1 = b.w1 AND p.w2 = b.w2
      LEFT JOIN cw1 u ON p.w1 = u.w1
      LEFT JOIN cont k ON p.w2 = k.w2
      CROSS JOIN tot t
    )
    SELECT lang, COUNT(*) AS n_pairs,
           CAST(SUM(unseen_ctx) AS BIGINT) AS n_unseen_ctx,
           ROUND(AVG(s), 6) AS mean_logprob
    FROM scored GROUP BY lang
"""


@register("kneser_ney_docs", _KN_SQL)
def kneser_ney_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bounds = d.agg(F.max("doc_id").alias("mx"))
    toks = d.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
        (F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)) < 7).alias(
            "in_train"
        ),
    )

    def pairs(df):
        return (
            df.filter(F.size("t") >= 2)
            .select(
                "lang",
                F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
                "t",
            )
            .select(
                "lang",
                F.element_at("t", F.col("i")).alias("w1"),
                F.element_at("t", F.col("i") + 1).alias("w2"),
            )
        )

    c2 = (
        pairs(toks.filter(F.col("in_train")))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    cw1 = c2.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count("*").alias("n_after")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n_before"))
    tot = c2.agg(F.count("*").alias("b_types")).crossJoin(
        c2.select(F.col("w1").alias("w"))
        .union(c2.select("w2"))
        .agg(F.count_distinct("w").alias("v"))
    )
    test = pairs(toks.filter(~F.col("in_train")))
    floor_p = (F.coalesce(F.col("n_before"), F.lit(0)) + 1.0) / (
        F.col("b_types") + F.col("v") + 1.0
    )
    seen_s = F.log(
        (
            F.coalesce(F.col("c"), F.lit(0))
            - F.when(F.col("c").isNotNull(), 0.75).otherwise(0.0)
        )
        / F.col("cw1")
        + 0.75 * F.col("n_after") / F.col("cw1") * floor_p
    )
    scored = (
        test.join(c2, ["w1", "w2"], "left")
        .join(cw1, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.when(F.col("cw1").isNull(), 1).otherwise(0).alias("unseen_ctx"),
            F.when(F.col("cw1").isNotNull(), seen_s)
            .otherwise(F.log(floor_p))
            .alias("s"),
        )
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum("unseen_ctx").cast("long").alias("n_unseen_ctx"),
        F.round(F.avg("s"), 6).alias("mean_logprob"),
    )


_LLR_SQL = r"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
    ),
    pairs AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks
            WHERE len(t) >= 2)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS k11 FROM pairs GROUP BY w1, w2),
    r AS (SELECT w1, SUM(k11) AS c1 FROM c2 GROUP BY w1),
    c AS (SELECT w2, SUM(k11) AS cc2 FROM c2 GROUP BY w2),
    n AS (SELECT SUM(k11) AS n FROM c2),
    cells AS (
      SELECT b.w1, b.w2, b.k11,
             r.c1 - b.k11 AS k12, c.cc2 - b.k11 AS k21,
             n.n - r.c1 - c.cc2 + b.k11 AS k22,
             r.c1, c.cc2, n.n
      FROM c2 b JOIN r ON b.w1 = r.w1 JOIN c ON b.w2 = c.w2 CROSS JOIN n
      WHERE b.k11 >= 3
    ),
    llr AS (
      SELECT w1 || ' ' || w2 AS bigram, k11,
             ROUND(2.0 * (
               CASE WHEN k11 > 0 THEN k11 * ln(k11 * 1.0 * n / (c1 * cc2))
                    ELSE 0 END
             + CASE WHEN k12 > 0
                    THEN k12 * ln(k12 * 1.0 * n / (c1 * (n - cc2)))
                    ELSE 0 END
             + CASE WHEN k21 > 0
                    THEN k21 * ln(k21 * 1.0 * n / ((n - c1) * cc2))
                    ELSE 0 END
             + CASE WHEN k22 > 0
                    THEN k22 * ln(k22 * 1.0 * n / ((n - c1) * (n - cc2)))
                    ELSE 0 END), 6) AS llr
      FROM cells
    )
    SELECT bigram, k11, llr
    FROM llr
    ORDER BY llr DESC, bigram
    LIMIT 20
"""


@register("dunning_llr_docs", _LLR_SQL)
def dunning_llr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
        )
        .select(
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("k11"))
    r = c2.groupBy("w1").agg(F.sum("k11").alias("c1"))
    c = c2.groupBy("w2").agg(F.sum("k11").alias("cc2"))
    n = c2.agg(F.sum("k11").alias("n"))
    cells = (
        c2.filter(F.col("k11") >= 3)
        .join(r, "w1")
        .join(c, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c1") - F.col("k11")).alias("k12"),
            (F.col("cc2") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("c1") - F.col("cc2") + F.col("k11")).alias(
                "k22"
            ),
            "c1",
            "cc2",
            "n",
        )
    )

    def term(k, num_r, num_c):
        return F.when(
            F.col(k) > 0,
            F.col(k)
            * F.log(F.col(k) * 1.0 * F.col("n") / (num_r * num_c)),
        ).otherwise(0.0)

    llr = F.round(
        2.0
        * (
            term("k11", F.col("c1"), F.col("cc2"))
            + term("k12", F.col("c1"), F.col("n") - F.col("cc2"))
            + term("k21", F.col("n") - F.col("c1"), F.col("cc2"))
            + term("k22", F.col("n") - F.col("c1"), F.col("n") - F.col("cc2"))
        ),
        6,
    )
    return (
        cells.select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"), "k11", llr.alias("llr")
        )
        .orderBy(F.col("llr").desc(), "bigram")
        .limit(20)
    )
