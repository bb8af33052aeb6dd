"""Ninetieth oracle-registry module: entity association strength and
dedup operating-point selection.

  * kg_comention_pmi — pointwise mutual information between canonical
    entity pairs over the verified KG pipeline's doc-level mentions:
    PMI = ln(N·n_ab / (n_a·n_b)) from exact integer doc counts, the
    association weighting that separates "co-mentioned because both
    are everywhere" from genuine affinity — the edge-weighting step
    between kg_comention (raw counts) and the ranking/graph ops that
    consume the co-mention graph.

  * dedup_threshold_sweep_docs — the dedup operating-point sweep: on
    a corpus with injected perturbed clones (ground truth by
    construction) and adjacent-doc near-miss pairs, classify each
    pair at Jaccard thresholds {0.3 … 0.99} and report
    precision/recall/F1 per threshold.  The threshold-selection
    companion to lsh_tuning_docs (which plans the index; this picks
    the decision boundary), built on the same exact trigram-shingle
    Jaccard machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracle_defs2 import _SQL_LINK, _SQL_TOKENIZE
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PMI_SQL = f"""
    WITH {_SQL_TOKENIZE},
    {_SQL_LINK},
    docgeo AS (
      SELECT DISTINCT w.doc_id, c.canonical AS geo
      FROM winners w JOIN canon c ON w.norm = c.norm
    ),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM docgeo),
    marg AS (SELECT geo, COUNT(*) AS c FROM docgeo GROUP BY geo),
    pairs AS (
      SELECT a.geo AS geo_a, b.geo AS geo_b, COUNT(*) AS n_ab
      FROM docgeo a JOIN docgeo b ON a.doc_id = b.doc_id AND a.geo < b.geo
      GROUP BY 1, 2
    )
    SELECT CAST(p.geo_a AS BIGINT) AS geo_a, CAST(p.geo_b AS BIGINT) AS geo_b,
           p.n_ab,
           ROUND(ln(n.n * p.n_ab * 1.0 / (ma.c * mb.c)), 6) AS pmi
    FROM pairs p
    JOIN marg ma ON ma.geo = p.geo_a
    JOIN marg mb ON mb.geo = p.geo_b
    CROSS JOIN n_docs n
"""


@register("kg_comention_pmi", _PMI_SQL)
def kg_comention_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs2 import _oracle_mentions, _oracle_variants
    from lnex_spark.operators.link import (
        apply_canonical,
        canonicalize,
        link_mentions,
        score_candidates,
    )

    variants = _oracle_variants(spark)
    winners = score_candidates(link_mentions(_oracle_mentions(spark, sf_dir), variants))
    final = apply_canonical(winners, canonicalize(winners))
    docgeo = final.select(
        F.col("conv_id").cast("long").alias("doc_id"), F.col("geo_id").alias("geo")
    ).distinct()
    n_docs = docgeo.agg(F.countDistinct("doc_id").alias("n"))
    marg = docgeo.groupBy("geo").agg(F.count("*").alias("c"))
    a = docgeo.select("doc_id", F.col("geo").alias("geo_a"))
    b = docgeo.select(F.col("doc_id").alias("doc_b"), F.col("geo").alias("geo_b"))
    pairs = (
        a.join(b, (a["doc_id"] == b["doc_b"]) & (a["geo_a"] < b["geo_b"]))
        .groupBy("geo_a", "geo_b")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        pairs.join(marg.select(F.col("geo").alias("geo_a"), F.col("c").alias("ca")), "geo_a")
        .join(marg.select(F.col("geo").alias("geo_b"), F.col("c").alias("cb")), "geo_b")
        .crossJoin(n_docs)
        .select(
            F.col("geo_a").cast("long").alias("geo_a"),
            F.col("geo_b").cast("long").alias("geo_b"),
            "n_ab",
            F.round(
                F.log(F.col("n") * F.col("n_ab") * 1.0 / (F.col("ca") * F.col("cb"))), 6
            ).alias("pmi"),
        )
    )


_SWEEP_SQL = r"""
    WITH uni AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 1000
      UNION ALL
      SELECT doc_id + 1000000, text || ' zq17x' FROM documents
      WHERE doc_id < 1000 AND doc_id % 7 = 0
    ),
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM uni),
    pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks WHERE len(t) >= 3),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1
      GROUP BY 1, 2
      UNION ALL
      SELECT a.doc_id, b.doc_id, count(*)
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1000000
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) AS s,
             CASE WHEN doc_b - doc_a = 1000000 THEN 1 ELSE 0 END AS is_dup
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    ),
    grid AS (
      SELECT CAST(0.3 AS DOUBLE) AS thr UNION ALL SELECT 0.5 UNION ALL SELECT 0.7
      UNION ALL SELECT 0.9 UNION ALL SELECT 0.95 UNION ALL SELECT 0.99
    ),
    judged AS (
      SELECT g.thr, p.is_dup, CASE WHEN p.s >= g.thr THEN 1 ELSE 0 END AS pred
      FROM grid g, pairs p
    )
    SELECT thr,
           CAST(SUM(CASE WHEN pred = 1 AND is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN pred = 1 AND is_dup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN pred = 0 AND is_dup = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           ROUND(SUM(CASE WHEN pred = 1 AND is_dup = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(pred), 0), 6) AS precision,
           ROUND(SUM(CASE WHEN pred = 1 AND is_dup = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(is_dup), 0), 6) AS recall,
           ROUND(2.0 * SUM(CASE WHEN pred = 1 AND is_dup = 1 THEN 1 ELSE 0 END)
                 / NULLIF(SUM(pred) + SUM(is_dup), 0), 6) AS f1
    FROM judged GROUP BY thr
"""


@register("dedup_threshold_sweep_docs", _SWEEP_SQL)
def dedup_threshold_sweep_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    uni = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq17x")).alias("text"),
        )
    )
    toks = uni.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    pos = toks.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(1), F.size("t") - 2)).alias("i")
    )
    sh = pos.select(
        "doc_id", F.array_join(F.slice("t", F.col("i"), 3), " ").alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    def common_for(offset: int) -> DataFrame:
        a = sh.select(F.col("doc_id").alias("a_doc"), F.col("shingle").alias("a_sh"))
        b = sh.select(
            (F.col("doc_id") - offset).alias("b_anchor"), F.col("shingle").alias("b_sh")
        )
        return (
            a.join(b, (a["a_doc"] == b["b_anchor"]) & (a["a_sh"] == b["b_sh"]))
            .groupBy(F.col("a_doc").alias("doc_a"))
            .agg(F.count("*").alias("n_common"))
            .select("doc_a", (F.col("doc_a") + offset).alias("doc_b"), "n_common")
        )

    common = common_for(1).unionByName(common_for(1000000))
    pairs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .select(
            (
                F.col("n_common") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("s"),
            F.when(F.col("doc_b") - F.col("doc_a") == 1000000, 1).otherwise(0).alias(
                "is_dup"
            ),
        )
    )
    grid = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (0.9,), (0.95,), (0.99,)], "thr double"
    )
    judged = grid.crossJoin(pairs).select(
        "thr",
        "is_dup",
        F.when(F.col("s") >= F.col("thr"), 1).otherwise(0).alias("pred"),
    )
    tp = F.sum(F.when((F.col("pred") == 1) & (F.col("is_dup") == 1), 1).otherwise(0))
    return judged.groupBy("thr").agg(
        tp.cast("long").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("is_dup") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("is_dup") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.round(tp * 1.0 / F.nullif(F.sum("pred"), F.lit(0)), 6).alias("precision"),
        F.round(tp * 1.0 / F.nullif(F.sum("is_dup"), F.lit(0)), 6).alias("recall"),
        F.round(
            2.0 * tp / F.nullif(F.sum("pred") + F.sum("is_dup"), F.lit(0)), 6
        ).alias("f1"),
    )
