"""Hundred-ninety-second oracle-registry module: modern LLM serving /
training diagnostics computed as data-pipeline jobs.

  * moe_load_balance_docs — Mixture-of-Experts router load-balance
    audit: each corpus token is routed to the argmax of 8
    deterministic md5 expert scores (score = hash fraction of
    (token, expert); softmax over the 8 scores for probabilities),
    reporting per expert its token fraction f_i, mean router
    probability P_i, the Switch-Transformer auxiliary loss
    N * sum f_i P_i (1 at perfect balance), and the router z-loss
    mean(ln sum exp s)^2.  The skew diagnosis that decides whether
    an expert-parallel deployment hotspots — the same salted-key
    thinking as x2_skew_salt, applied to expert routing.

  * speculative_acceptance_docs — speculative-decoding acceptance
    model between a "draft" distribution q (unigram over src0-src9
    docs) and a "target" distribution p (unigram over the rest):
    acceptance alpha = sum_x min(p(x), q(x)) over the shared
    vocabulary, and the expected tokens emitted per target-model
    pass E = (1 - alpha^(g+1)) / (1 - alpha) for draft lengths
    g = 2, 4, 8 (Leviathan et al.).  Distribution mismatch measured
    in the one unit serving actually cares about: accepted draft
    tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MOE_SQL = """
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    types AS (
      SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok
    ),
    scored AS (
      SELECT t.tok, t.cnt, e.e,
             CAST(('0x' || substr(md5(t.tok || '/e' || CAST(e.e AS VARCHAR)),
                   1, 8)) AS BIGINT) / 4294967296.0 AS s
      FROM types t CROSS JOIN (SELECT UNNEST(range(0, 8)) AS e) e
    ),
    smax AS (
      SELECT tok, cnt, e, s,
             SUM(EXP(s)) OVER (PARTITION BY tok) AS z,
             MAX(s) OVER (PARTITION BY tok) AS best
      FROM scored
    ),
    routed AS (
      SELECT tok, cnt, e, EXP(s) / z AS p,
             CASE WHEN s = best THEN 1 ELSE 0 END AS chosen,
             LN(z) AS lnz
      FROM smax
    ),
    ntok AS (SELECT SUM(cnt) AS n FROM types),
    per_expert AS (
      SELECT e,
             SUM(CAST(cnt AS DOUBLE) * chosen) / (SELECT n FROM ntok) AS f,
             SUM(CAST(cnt AS DOUBLE) * p) / (SELECT n FROM ntok) AS mean_p,
             SUM(cnt * chosen) AS n_routed
      FROM routed GROUP BY e
    ),
    aux AS (
      SELECT SUM(f * mean_p) * 8 AS aux_loss FROM per_expert
    ),
    zloss AS (
      SELECT SUM(CAST(cnt AS DOUBLE) * lnz * lnz / 8)
               / (SELECT n FROM ntok) AS z_loss
      FROM routed
    )
    SELECT pe.e AS expert,
           CAST(pe.n_routed AS BIGINT) AS n_tokens,
           ROUND(pe.f, 6) AS token_frac,
           ROUND(pe.mean_p, 6) AS mean_router_prob,
           ROUND((SELECT aux_loss FROM aux), 6) AS aux_loss,
           ROUND((SELECT z_loss FROM zloss), 6) AS z_loss
    FROM per_expert pe
    ORDER BY expert
"""


@register("moe_load_balance_docs", _MOE_SQL)
def moe_load_balance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    types = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    experts = d.sparkSession.range(0, 8).select(F.col("id").alias("e"))
    scored = types.crossJoin(F.broadcast(experts)).select(
        "tok",
        "cnt",
        "e",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("tok"), F.lit("/e"), F.col("e").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            / 4294967296.0
        ).alias("s"),
    )
    wt = Window.partitionBy("tok")
    routed = scored.select(
        "tok",
        "cnt",
        "e",
        (F.exp("s") / F.sum(F.exp("s")).over(wt)).alias("p"),
        F.when(F.col("s") == F.max("s").over(wt), 1).otherwise(0).alias(
            "chosen"
        ),
        F.log(F.sum(F.exp("s")).over(wt)).alias("lnz"),
    )
    ntok = types.agg(F.sum("cnt").alias("n"))
    per_expert = (
        routed.crossJoin(F.broadcast(ntok))
        .groupBy("e")
        .agg(
            (
                F.sum(F.col("cnt").cast("double") * F.col("chosen"))
                / F.max("n")
            ).alias("f"),
            (
                F.sum(F.col("cnt").cast("double") * F.col("p")) / F.max("n")
            ).alias("mean_p"),
            F.sum(F.col("cnt") * F.col("chosen")).alias("n_routed"),
        )
    )
    aux = per_expert.agg(
        (F.sum(F.col("f") * F.col("mean_p")) * 8).alias("aux_loss")
    )
    zloss = (
        routed.crossJoin(F.broadcast(ntok))
        .agg(
            (
                F.sum(
                    F.col("cnt").cast("double")
                    * F.col("lnz")
                    * F.col("lnz")
                    / 8
                )
                / F.max("n")
            ).alias("z_loss")
        )
    )
    return (
        per_expert.crossJoin(F.broadcast(aux))
        .crossJoin(F.broadcast(zloss))
        .select(
            F.col("e").alias("expert"),
            F.col("n_routed").cast("long").alias("n_tokens"),
            F.round("f", 6).alias("token_frac"),
            F.round("mean_p", 6).alias("mean_router_prob"),
            F.round("aux_loss", 6).alias("aux_loss"),
            F.round("z_loss", 6).alias("z_loss"),
        )
        .orderBy("expert")
    )


_SPEC_SQL = """
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
    lab AS (
      SELECT tok,
             CASE WHEN CAST(SUBSTR(source, 4) AS INTEGER) < 10
                  THEN 'q' ELSE 'p' END AS side
      FROM clean
    ),
    dist AS (
      SELECT side, tok, COUNT(*) AS c FROM lab GROUP BY side, tok
    ),
    tot AS (SELECT side, SUM(c) AS n FROM dist GROUP BY side),
    probs AS (
      SELECT d.tok,
             MAX(CASE WHEN d.side = 'p'
                      THEN CAST(d.c AS DOUBLE) / t.n END) AS p,
             MAX(CASE WHEN d.side = 'q'
                      THEN CAST(d.c AS DOUBLE) / t.n END) AS q
      FROM dist d JOIN tot t ON t.side = d.side
      GROUP BY d.tok
    ),
    alpha AS (
      SELECT SUM(LEAST(COALESCE(p, 0), COALESCE(q, 0))) AS a FROM probs
    ),
    gammas AS (SELECT UNNEST([2, 4, 8]) AS g)
    SELECT g.g AS draft_len,
           ROUND((SELECT a FROM alpha), 6) AS alpha,
           ROUND((1 - POW((SELECT a FROM alpha), g.g + 1))
                 / (1 - (SELECT a FROM alpha)), 6) AS expected_tokens,
           ROUND(((1 - POW((SELECT a FROM alpha), g.g + 1))
                  / (1 - (SELECT a FROM alpha))) / (g.g + 1), 6)
             AS draft_efficiency
    FROM gammas g
    ORDER BY draft_len
"""


@register("speculative_acceptance_docs", _SPEC_SQL)
def speculative_acceptance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    lab = clean.select(
        "tok",
        F.when(
            F.substring("source", 4, 10).cast("int") < 10, "q"
        )
        .otherwise("p")
        .alias("side"),
    )
    dist = lab.groupBy("side", "tok").agg(F.count("*").alias("c"))
    tot = dist.groupBy("side").agg(F.sum("c").alias("n"))
    probs = (
        dist.join(F.broadcast(tot), "side")
        .groupBy("tok")
        .agg(
            F.max(
                F.when(
                    F.col("side") == "p",
                    F.col("c").cast("double") / F.col("n"),
                )
            ).alias("p"),
            F.max(
                F.when(
                    F.col("side") == "q",
                    F.col("c").cast("double") / F.col("n"),
                )
            ).alias("q"),
        )
    )
    alpha = probs.agg(
        F.sum(
            F.least(
                F.coalesce("p", F.lit(0.0)), F.coalesce("q", F.lit(0.0))
            )
        ).alias("a")
    )
    gammas = d.sparkSession.createDataFrame([(2,), (4,), (8,)], "g int")
    exp_tok = (1 - F.pow(F.col("a"), F.col("g") + 1)) / (1 - F.col("a"))
    return (
        F.broadcast(gammas)
        .crossJoin(alpha)
        .select(
            F.col("g").alias("draft_len"),
            F.round("a", 6).alias("alpha"),
            F.round(exp_tok, 6).alias("expected_tokens"),
            F.round(exp_tok / (F.col("g") + 1), 6).alias("draft_efficiency"),
        )
        .orderBy("draft_len")
    )
