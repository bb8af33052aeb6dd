"""Ninety-eighth oracle-registry module: canonicalization stability
and join skew amplification.

  * kg_canonical_drift — the canonicalization-drift audit between
    two ingest batches: run the verified literal-gazetteer pipeline
    on even-doc_id and odd-doc_id halves separately, compare each
    surface form's canonical winner, and report agreement plus the
    flipped forms' vote margins.  The measurement behind the
    incremental-KG guarantee (incremental_votes_merge proves the
    merged state is exact; this quantifies how much a SINGLE batch's
    canonical map can be trusted before merging).

  * join_skew_amplification — the join-planning audit for skew on a
    genuinely many-to-many join (events.user_id%10 ⋈
    orders.o_custkey%10 — both sides have many rows per key, the
    fan-out shape of dimension-bucket joins): per-key counts on both
    sides, exact output rows per key (c_l·c_r), and the top-key
    share before vs after — multiplicative amplification is why a
    mildly skewed key can dominate a shuffle join's longest task.
    Computed from the two key histograms WITHOUT materializing the
    join (the same histogram trick as join_card_estimate_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracle_defs2 import _SQL_LINK, _SQL_TOKENIZE
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _half_canon_cte(tag: str, parity: int) -> str:
    """The _SQL_LINK canonicalization restricted to one doc parity."""
    return f"""
    linked_{tag} AS (
      SELECT f.doc_id, f.s, f.e, f.norm, g.geo_id, g.match_type, g.cat_priority
      FROM final f JOIN gaz g USING (norm)
      WHERE f.doc_id % 2 = {parity}
    ),
    winners_{tag} AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id, s, e
          ORDER BY match_type DESC, cat_priority ASC, geo_id ASC) AS rk
        FROM linked_{tag}) WHERE rk = 1
    ),
    votes_{tag} AS (
      SELECT norm, geo_id, count(*) AS v FROM winners_{tag} GROUP BY norm, geo_id
    ),
    canon_{tag} AS (
      SELECT norm, geo_id AS canonical, v AS win_votes, tot FROM (
        SELECT *, row_number() OVER (
          PARTITION BY norm ORDER BY v DESC, geo_id ASC) AS rk,
               SUM(v) OVER (PARTITION BY norm) AS tot
        FROM votes_{tag}) WHERE rk = 1
    )"""


_DRIFT_SQL = f"""
    WITH {_SQL_TOKENIZE},
    {_half_canon_cte("a", 0)},
    {_half_canon_cte("b", 1)}
    SELECT a.norm,
           CAST(a.canonical AS BIGINT) AS canon_even,
           CAST(b.canonical AS BIGINT) AS canon_odd,
           CAST(a.win_votes AS BIGINT) AS votes_even,
           CAST(b.win_votes AS BIGINT) AS votes_odd,
           CAST(a.canonical = b.canonical AS INTEGER) AS agree
    FROM canon_a a JOIN canon_b b ON a.norm = b.norm
"""


@register("kg_canonical_drift", _DRIFT_SQL)
def kg_canonical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs2 import _oracle_mentions, _oracle_variants
    from lnex_spark.operators.link import (
        canonicalize,
        link_mentions,
        score_candidates,
    )

    variants = _oracle_variants(spark)
    mentions = _oracle_mentions(spark, sf_dir)

    def half(parity: int) -> DataFrame:
        m = mentions.filter(F.col("conv_id").cast("long") % 2 == parity)
        winners = score_candidates(link_mentions(m, variants))
        votes = winners.groupBy("norm", "geo_id").agg(F.count("*").alias("v"))
        from pyspark.sql import Window

        wn = Window.partitionBy("norm")
        ranked = votes.select(
            "norm",
            "geo_id",
            "v",
            F.row_number()
            .over(wn.orderBy(F.desc("v"), F.asc("geo_id")))
            .alias("rk"),
        )
        return ranked.filter(F.col("rk") == 1).select(
            "norm", F.col("geo_id").alias("canonical"), F.col("v").alias("win_votes")
        )

    a = half(0).select(
        "norm",
        F.col("canonical").alias("canon_even"),
        F.col("win_votes").alias("votes_even"),
    )
    b = half(1).select(
        "norm",
        F.col("canonical").alias("canon_odd"),
        F.col("win_votes").alias("votes_odd"),
    )
    return a.join(b, "norm").select(
        "norm",
        F.col("canon_even").cast("long").alias("canon_even"),
        F.col("canon_odd").cast("long").alias("canon_odd"),
        F.col("votes_even").cast("long").alias("votes_even"),
        F.col("votes_odd").cast("long").alias("votes_odd"),
        (F.col("canon_even") == F.col("canon_odd")).cast("int").alias("agree"),
    )


_AMP_SQL = """
    WITH hl AS (
      SELECT user_id % 10 AS k, COUNT(*) AS cl FROM events GROUP BY user_id % 10
    ),
    ho AS (
      SELECT o_custkey % 10 AS k, COUNT(*) AS co FROM orders GROUP BY o_custkey % 10
    ),
    merged AS (
      SELECT hl.k, hl.cl, ho.co, hl.cl * ho.co AS c_out
      FROM hl JOIN ho ON hl.k = ho.k
    ),
    tots AS (
      SELECT SUM(cl) AS n_l, SUM(co) AS n_o, SUM(c_out) AS n_out,
             MAX(cl) AS max_l, MAX(c_out) AS max_out
      FROM merged
    )
    SELECT CAST(n_l AS BIGINT) AS n_left, CAST(n_o AS BIGINT) AS n_right,
           CAST(n_out AS BIGINT) AS n_join_rows,
           ROUND(max_l * 1.0 / n_l, 6) AS top_key_share_in,
           ROUND(max_out * 1.0 / n_out, 6) AS top_key_share_out,
           ROUND((max_out * 1.0 / n_out) / (max_l * 1.0 / n_l), 6)
             AS amplification
    FROM tots
"""


@register("join_skew_amplification", _AMP_SQL)
def join_skew_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    hl = ev.groupBy((F.col("user_id") % 10).alias("k")).agg(F.count("*").alias("cl"))
    ho = o.groupBy((F.col("o_custkey") % 10).alias("k")).agg(F.count("*").alias("co"))
    merged = hl.join(ho, "k").select(
        "cl", "co", (F.col("cl") * F.col("co")).alias("c_out")
    )
    tots = merged.agg(
        F.sum("cl").alias("n_l"),
        F.sum("co").alias("n_o"),
        F.sum("c_out").alias("n_out"),
        F.max("cl").alias("max_l"),
        F.max("c_out").alias("max_out"),
    )
    share_in = F.col("max_l") * 1.0 / F.col("n_l")
    share_out = F.col("max_out") * 1.0 / F.col("n_out")
    return tots.select(
        F.col("n_l").cast("long").alias("n_left"),
        F.col("n_o").cast("long").alias("n_right"),
        F.col("n_out").cast("long").alias("n_join_rows"),
        F.round(share_in, 6).alias("top_key_share_in"),
        F.round(share_out, 6).alias("top_key_share_out"),
        F.round(share_out / share_in, 6).alias("amplification"),
    )
