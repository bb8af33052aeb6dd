"""Twenty-ninth oracle-registry module: BPE tokenizer training,
labeler agreement, skip-gram training pairs, and a Benford audit.

  * bpe_merges_docs — byte-pair-encoding merge induction
    (textstats.bpe_merges): the first 3 learned merges over the
    frequency-weighted word vocabulary.  Tokenizer TRAINING as a
    Spark job — the iterative-algorithm class (like k-means /
    PageRank) applied to the op a training-data pipeline runs before
    any token counting is meaningful.  The lhs != rhs candidate
    restriction makes "merge all occurrences" overlap-free and hence
    exactly relational; the DuckDB twin unrolls all three rounds,
    including the data-dependent top-pair choice, as nested CTEs —
    so the value check covers the whole training loop, merge
    decisions included.
  * labeler_agreement_docs — Cohen's kappa between the engine's
    heuristic language ID and the corpus ``lang`` column: the
    annotation-QA statistic (chance-corrected agreement) every
    labeling pipeline reports.  Marginal products via one tiny
    per-label join; the kappa formula is written identically on both
    engines over exact integer counts.
  * skipgram_pairs_docs — (center, context) co-occurrence counts
    within a ±2 token window: the word2vec/GloVe training-pair
    extraction job.  One positional self-join per doc (doc_id-equi
    join + band predicate), corpus-aggregated; vocabulary-bounded
    output.
  * benford_totalprice — first-significant-digit distribution of
    order totals vs Benford's law expectation: the classic
    fabricated-data audit.  Digit taken from the decimal string of
    the exact integer floor — no float log in the digit derivation
    (log10 appears only in the rounded expected-share column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs import _dd_word_count
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- BPE merge induction (unrolled training loop) --------------------------
def _bpe_round(prev: str, r: int) -> str:
    """One unrolled BPE round: pair counts → top pair → merge-apply."""
    return f"""
    p{r} AS (
      SELECT a, b, sum(wf) AS cnt FROM (
        SELECT wf, sym AS a,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b
        FROM {prev})
      WHERE b IS NOT NULL AND a <> b GROUP BY a, b
    ),
    m{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    x{r} AS (
      SELECT word, wf, pos, sym, a, b, hit,
             lag(hit) OVER (PARTITION BY word ORDER BY pos) AS prev_hit
      FROM (
        SELECT s.word, s.wf, s.pos, s.sym, m.a, m.b,
               coalesce(s.sym = m.a AND
                 lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = m.b,
                 FALSE) AS hit
        FROM {prev} s CROSS JOIN m{r} m)
    ),
    s{r} AS (
      SELECT word, wf,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN hit THEN a || b ELSE sym END AS sym
      FROM x{r} WHERE NOT coalesce(prev_hit, FALSE)
    )"""


_BPE_SQL = (
    r"""
    WITH words AS (
      SELECT w AS word, count(*) AS wf FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    s0 AS (
      SELECT word, wf, i AS pos, substr(word, CAST(i AS INT), 1) AS sym
      FROM words, unnest(range(1, len(word) + 1)) AS t(i)
    ),"""
    + ",".join(_bpe_round(f"s{r - 1}", r) for r in range(1, 4))
    + """
    SELECT 1 AS rank, a AS lhs, b AS rhs, cnt AS freq FROM m1
    UNION ALL SELECT 2, a, b, cnt FROM m2
    UNION ALL SELECT 3, a, b, cnt FROM m3
    """
)


@register("bpe_merges_docs", _BPE_SQL)
def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.textstats import bpe_merges

    return bpe_merges(_t(spark, sf_dir, "documents"), rounds=3)


# --- Cohen's kappa: heuristic lang-id vs corpus labels ---------------------
_KAPPA_SQL = f"""
    WITH hits AS (
      SELECT doc_id,
        {_dd_word_count('der')} + {_dd_word_count('die')} + {_dd_word_count('und')} + {_dd_word_count('ist')} + {_dd_word_count('nicht')} AS h_de,
        {_dd_word_count('the')} + {_dd_word_count('and')} + {_dd_word_count('of')} + {_dd_word_count('to')} + {_dd_word_count('is')} AS h_en,
        {_dd_word_count('el')} + {_dd_word_count('los')} + {_dd_word_count('que')} + {_dd_word_count('por')} + {_dd_word_count('una')} AS h_es,
        {_dd_word_count('le')} + {_dd_word_count('la')} + {_dd_word_count('et')} + {_dd_word_count('les')} + {_dd_word_count('des')} AS h_fr
      FROM documents
    ),
    preds AS (
      SELECT doc_id,
             CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                  WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                  WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM hits
    ),
    j AS (
      SELECT p.pred_lang, d.lang FROM preds p JOIN documents d USING (doc_id)
    ),
    tot AS (
      SELECT count(*) AS n,
             sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS agree
      FROM j
    ),
    pr AS (SELECT pred_lang AS lab, count(*) AS n_pred FROM j GROUP BY 1),
    gt AS (SELECT lang AS lab, count(*) AS n_true FROM j GROUP BY 1),
    pe AS (SELECT sum(n_pred * n_true) AS pp FROM pr JOIN gt USING (lab))
    SELECT n AS n_docs,
           round(agree * 1.0 / n, 6) AS po,
           round(pp * 1.0 / (n * n), 6) AS pe_chance,
           round((agree * 1.0 / n - pp * 1.0 / (n * n))
                 / (1 - pp * 1.0 / (n * n)), 6) AS kappa
    FROM tot CROSS JOIN pe
"""


@register("labeler_agreement_docs", _KAPPA_SQL)
def labeler_agreement_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected inter-labeler agreement (Cohen's kappa) between
    lang_id's marker-stopword heuristic and the ground-truth lang
    column.  Marginals that appear on only one side (e.g. 'zh' — no
    markers, never predicted) contribute zero to the chance term via
    the inner marginal join, exactly as in the textbook formula."""
    from lnex_spark.operators.textquality import lang_id

    d = _t(spark, sf_dir, "documents")
    j = lang_id(d).join(d.select("doc_id", "lang"), "doc_id").select(
        "pred_lang", "lang"
    )
    tot = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)).alias(
            "agree"
        ),
    )
    pr = j.groupBy(F.col("pred_lang").alias("lab")).agg(F.count("*").alias("n_pred"))
    gt = j.groupBy(F.col("lang").alias("lab")).agg(F.count("*").alias("n_true"))
    pe = (
        pr.join(gt, "lab")
        .agg(F.sum(F.col("n_pred") * F.col("n_true")).alias("pp"))
    )
    po_expr = F.col("agree") * 1.0 / F.col("n")
    pe_expr = F.col("pp") * 1.0 / (F.col("n") * F.col("n"))
    return tot.crossJoin(pe).select(
        F.col("n").alias("n_docs"),
        F.round(po_expr, 6).alias("po"),
        F.round(pe_expr, 6).alias("pe_chance"),
        F.round((po_expr - pe_expr) / (1 - pe_expr), 6).alias("kappa"),
    )


# --- word2vec skip-gram training pairs -------------------------------------
_SKIPGRAM_SQL = r"""
    WITH t AS (
      SELECT doc_id, i AS pos, toks[CAST(i AS INT)] AS tok
      FROM (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE doc_id % 5 = 0),
      unnest(range(1, len(toks) + 1)) AS r(i)
      WHERE toks[CAST(i AS INT)] <> ''
    )
    SELECT a.tok AS center, b.tok AS context, count(*) AS n_pairs
    FROM t a JOIN t b
      ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) BETWEEN 1 AND 2
    GROUP BY 1, 2
"""


@register("skipgram_pairs_docs", _SKIPGRAM_SQL)
def skipgram_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(center, context) counts within a ±2 raw-position window — the
    word2vec training-pair extraction job.  doc_id-equi self-join with
    a band predicate (positions of a doc are co-partitioned by the
    join key, so the band check is a local filter), then one
    vocabulary²-bounded hash agg."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    t = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "tok"
        ),
    ).filter(F.col("tok") != "")
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")).between(1, 2)),
        )
        .groupBy(F.col("a.tok").alias("center"), F.col("b.tok").alias("context"))
        .agg(F.count("*").alias("n_pairs"))
    )


# --- Benford first-digit audit ---------------------------------------------
_BENFORD_SQL = """
    WITH d AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS digit,
             count(*) AS n
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    )
    SELECT digit, n,
           round(n * 1.0 / (SELECT sum(n) FROM d), 6) AS share,
           round(log10(1 + 1.0 / CAST(digit AS INT)), 6) AS benford_expected
    FROM d
"""


@register("benford_totalprice", _BENFORD_SQL)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of order totals against the
    Benford expectation log10(1 + 1/d) — the standard fabricated-data
    screen a data-quality intake runs on monetary columns.  The digit
    comes from the decimal string of the exact integer floor (no
    float log in the digit path — floor of a double ≥ 1 is exact, and
    its first digit equals the value's first significant digit)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).alias("digit")
    ).groupBy("digit").agg(F.count("*").alias("n"))
    total = Window.partitionBy()
    return d.select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(total), 6).alias("share"),
        F.round(F.log10(1 + 1.0 / F.col("digit").cast("int")), 6).alias(
            "benford_expected"
        ),
    )
