"""Fifth oracle-registry module: training-data curation ops
(operators/curation.py) — deterministic md5-gated train/val/test
splits, inverse-frequency class weights, PII scrubbing, benchmark
contamination via 5-gram collision, and the quality-filter funnel
with first-failing-rule attribution.

All five are SQL value-hash-verified.  The PII and funnel ops run on
deterministically perturbed corpora (injected emails/phones/IPs,
planted duplicates and junk docs) built with identical CASE
expressions on both sides, so every rule actually fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- deterministic train/val/test split ---------------------------------
@register(
    "split_assign_docs",
    """
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split-v1#' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
      FROM documents WHERE doc_id < 1000
    )
    SELECT doc_id,
           CASE WHEN bucket < 52428 THEN 'train'
                WHEN bucket < 58982 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def split_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.curation import split_assign

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return split_assign(d).select("doc_id", "split")


# --- inverse-frequency class weights ------------------------------------
@register(
    "class_weights_embeddings",
    """
    WITH per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
    tot AS (SELECT sum(n) AS total, count(*) AS k FROM per)
    SELECT label, n, round(total * 1.0 / (k * n), 6) AS weight
    FROM per CROSS JOIN tot
    """,
)
def class_weights_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.curation import class_weights

    return class_weights(_t(spark, sf_dir, "embeddings"), "label")


_PII_INJECT_SQL = """
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 (555) 010-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                  || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
      FROM documents WHERE doc_id < 100
"""


# --- PII scrubbing -------------------------------------------------------
@register(
    "pii_scrub_docs",
    rf"""
    WITH injected AS ({_PII_INJECT_SQL})
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}', '<email>', 'g'),
               '\+?[0-9][0-9()\- ]{{7,}}[0-9]', '<phone>', 'g'),
             '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}', '<ip>', 'g') AS scrubbed
    FROM injected
    """,
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.curation import pii_scrub

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return pii_scrub(injected).select("doc_id", "scrubbed")


# --- benchmark contamination (5-gram collision) -------------------------
@register(
    "contamination_check",
    r"""
    WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    be AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200 AND doc_id < 240),
    tr_toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM tr),
    tr_pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM tr_toks WHERE len(t) >= 5),
    tr_sh AS (SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS shingle FROM tr_pos),
    be_toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM be),
    be_pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM be_toks WHERE len(t) >= 5),
    be_sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM be_pos),
    per AS (SELECT doc_id, count(*) AS n_grams FROM be_sh GROUP BY 1),
    hits AS (
      SELECT b.doc_id, count(*) AS n_hit FROM be_sh b
      WHERE EXISTS (SELECT 1 FROM tr_sh t WHERE t.shingle = b.shingle)
      GROUP BY 1
    )
    SELECT per.doc_id, per.n_grams,
           coalesce(hits.n_hit, 0) AS n_hit,
           coalesce(hits.n_hit, 0) > 0 AS contaminated
    FROM per LEFT JOIN hits ON per.doc_id = hits.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.curation import contamination

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") < 200)
    bench = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 240))
    return contamination(train, bench, n=5)


# corpus perturbed so every funnel rule fires: planted exact duplicates
# (+1000000 ids), short junk every 17th doc, punctuation junk every 23rd
_FUNNEL_CORPUS_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 0 THEN 'a! b! c! d! e! f!'
                  WHEN doc_id % 17 = 0 THEN 'a b'
                  ELSE text END AS text
      FROM (
        SELECT doc_id, text FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 80
      )
"""


# --- quality-filter funnel with drop-reason attribution -----------------
@register(
    "quality_funnel_docs",
    rf"""
    WITH corpus AS ({_FUNNEL_CORPUS_SQL}),
    f AS (
      SELECT doc_id, text, md5(lower(trim(text))) AS fp,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             CASE WHEN length(text) > 0
                  THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text)
                  ELSE 0.0 END AS punct_ratio
      FROM corpus
    ),
    surv AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY 1)
    SELECT reason, count(*) AS n FROM (
      SELECT CASE WHEN f.n_tokens < 5 THEN 'too_short'
                  WHEN f.punct_ratio > 0.2 THEN 'high_punct'
                  WHEN f.doc_id <> surv.keep_id THEN 'dup_fingerprint'
                  ELSE 'kept' END AS reason
      FROM f JOIN surv ON f.fp = surv.fp
    ) GROUP BY reason
    """,
)
def quality_funnel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.curation import quality_funnel

    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < 400).select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") < 80)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    corpus = base.unionByName(dups).select(
        "doc_id",
        F.when(F.col("doc_id") % 23 == 0, "a! b! c! d! e! f!")
        .when(F.col("doc_id") % 17 == 0, "a b")
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return quality_funnel(corpus)
