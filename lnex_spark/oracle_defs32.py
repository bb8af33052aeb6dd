"""Thirty-second oracle-registry module: rank fusion, per-class eval,
activity streaks, rolling distinct reach, and table checksums.

  * ann_rrf_fusion — reciprocal-rank fusion (RRF, k=60) of the two
    verified ANN rankings (brute-force truth and the IVF index):
    the standard way hybrid search combines retrievers without score
    normalization.  Composes two value-checked derivations; ties on
    the fused score break by vec_id, and ranking happens on the
    ROUNDED score so both engines order identically.
  * lang_confusion_docs — per-class precision/recall/F1 of the
    heuristic language ID against corpus labels: the per-class
    drill-down behind labeler_agreement_docs' single kappa (macro
    metrics need the class rows, not the trace).  Classes appearing
    only as truth ('zh') or only as prediction ('und') get explicit
    zero marginals via outer marginal joins.
  * streaks_users — longest run of consecutive active days per user:
    the date-anchor trick (day minus dense per-user day rank is
    constant within a streak) — gaps-and-islands on the calendar,
    all windows user-keyed.
  * rolling_distinct_users — trailing-7-day distinct user reach per
    day.  COUNT(DISTINCT) cannot ride a window frame, so the op joins
    the (day, user) distinct grid to a day spine with a range
    predicate (the spine is ~30 rows — broadcast) and aggregates:
    the standard rolling-reach formulation.
  * table_checksum_orders — order-insensitive table fingerprint:
    per-row md5 over a canonical '|'-joined projection of the stable
    columns, folded by SUM of a 32-bit prefix (+ row count).  The
    replication/migration integrity check that complements
    table_diff_orders when the two sides cannot be co-located; only
    exactly-representable columns participate (no float formatting
    in the hash path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracle_defs import _ANN_TOPK_SQL
from lnex_spark.oracle_defs2 import _ANN_IVF_SQL
from lnex_spark.oracle_defs29 import _KAPPA_SQL  # noqa: F401  (doc cross-ref)
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- reciprocal-rank fusion of two ANN rankings ----------------------------
_RRF_SQL = f"""
    WITH truth AS ({_ANN_TOPK_SQL}),
    ivf AS ({_ANN_IVF_SQL}),
    u AS (
      SELECT query_id, vec_id, 1.0 / (60 + rank) AS s FROM truth
      UNION ALL
      SELECT query_id, vec_id, 1.0 / (60 + rank) AS s FROM ivf
    ),
    fused AS (
      SELECT query_id, vec_id, round(sum(s), 6) AS rrf_score
      FROM u GROUP BY query_id, vec_id
    )
    SELECT query_id, vec_id, rrf_score, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, vec_id ASC) AS rk
      FROM fused)
    WHERE rk <= 5
"""


@register("ann_rrf_fusion", _RRF_SQL)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = cosine_topk_bruteforce(e, q, k=5).select("query_id", "vec_id", "rank")
    ivf = cosine_topk_ivf(e, q, n_cells=8, nprobe=2, k=5).select(
        "query_id", "vec_id", "rank"
    )
    u = truth.unionByName(ivf).select(
        "query_id", "vec_id", (1.0 / (60 + F.col("rank"))).alias("s")
    )
    fused = u.groupBy("query_id", "vec_id").agg(F.round(F.sum("s"), 6).alias("rrf_score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("vec_id").asc()
    )
    return fused.select(
        "query_id", "vec_id", "rrf_score", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 5)


# --- per-class confusion / F1 of the language labeler ----------------------
_CONF_SQL = (
    _KAPPA_SQL[: _KAPPA_SQL.index("tot AS")]
    + """classes AS (
      SELECT lang AS cls FROM j UNION SELECT pred_lang FROM j
    ),
    tr AS (SELECT lang AS cls, count(*) AS n_true FROM j GROUP BY 1),
    pd AS (SELECT pred_lang AS cls, count(*) AS n_pred FROM j GROUP BY 1),
    tp AS (SELECT lang AS cls, count(*) AS tp FROM j
           WHERE lang = pred_lang GROUP BY 1)
    SELECT c.cls,
           coalesce(n_true, 0) AS n_true,
           coalesce(n_pred, 0) AS n_pred,
           coalesce(tp, 0) AS tp,
           round(CASE WHEN coalesce(n_pred, 0) > 0
                 THEN coalesce(tp, 0) * 1.0 / n_pred ELSE 0 END, 6) AS precision,
           round(CASE WHEN coalesce(n_true, 0) > 0
                 THEN coalesce(tp, 0) * 1.0 / n_true ELSE 0 END, 6) AS recall,
           round(CASE WHEN coalesce(tp, 0) > 0
                 THEN 2.0 * tp / (n_pred + n_true) ELSE 0 END, 6) AS f1
    FROM classes c
    LEFT JOIN tr ON tr.cls = c.cls
    LEFT JOIN pd ON pd.cls = c.cls
    LEFT JOIN tp ON tp.cls = c.cls
"""
)


@register("lang_confusion_docs", _CONF_SQL)
def lang_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class P/R/F1 of lang_id vs the lang column.  F1 written as
    2·tp/(n_pred+n_true) — the p/r-free algebraic form, well-defined
    whenever tp>0 and exactly 0 otherwise (no 0/0 path)."""
    from lnex_spark.operators.textquality import lang_id

    d = _t(spark, sf_dir, "documents")
    j = lang_id(d).join(d.select("doc_id", "lang"), "doc_id").select(
        "pred_lang", "lang"
    )
    classes = (
        j.select(F.col("lang").alias("cls"))
        .union(j.select("pred_lang"))
        .distinct()
    )
    tr = j.groupBy(F.col("lang").alias("cls")).agg(F.count("*").alias("n_true"))
    pd = j.groupBy(F.col("pred_lang").alias("cls")).agg(F.count("*").alias("n_pred"))
    tp = (
        j.filter(F.col("lang") == F.col("pred_lang"))
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count("*").alias("tp"))
    )
    out = (
        classes.join(tr, "cls", "left").join(pd, "cls", "left").join(tp, "cls", "left")
    )
    n_true = F.coalesce(F.col("n_true"), F.lit(0))
    n_pred = F.coalesce(F.col("n_pred"), F.lit(0))
    tp_c = F.coalesce(F.col("tp"), F.lit(0))
    return out.select(
        "cls",
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        tp_c.alias("tp"),
        F.round(
            F.when(n_pred > 0, tp_c * 1.0 / F.col("n_pred")).otherwise(0.0), 6
        ).alias("precision"),
        F.round(
            F.when(n_true > 0, tp_c * 1.0 / F.col("n_true")).otherwise(0.0), 6
        ).alias("recall"),
        F.round(
            F.when(tp_c > 0, 2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_true")))
            .otherwise(0.0),
            6,
        ).alias("f1"),
    )


# --- longest consecutive-day activity streak -------------------------------
_STREAK_SQL = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    anch AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INT) AS anchor
      FROM days
    ),
    runs AS (
      SELECT user_id, anchor, count(*) AS len FROM anch GROUP BY 1, 2
    )
    SELECT user_id, max(len) AS longest_streak, sum(len) AS n_active_days
    FROM runs GROUP BY user_id
"""


@register("streaks_users", _STREAK_SQL)
def streaks_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    anch = days.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    runs = anch.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"), F.sum("len").alias("n_active_days")
    )


# --- trailing-7-day distinct user reach ------------------------------------
_ROLLING_SQL = """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    spine AS (SELECT DISTINCT d FROM du)
    SELECT g.d, count(DISTINCT du.user_id) AS users_7d
    FROM spine g JOIN du ON du.d BETWEEN g.d - 6 AND g.d
    GROUP BY g.d
"""


@register("rolling_distinct_users", _ROLLING_SQL)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        _t(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
    )
    spine = du.select("d").distinct().withColumnRenamed("d", "g")
    return (
        F.broadcast(spine)
        .join(
            du,
            (F.col("d") >= F.date_sub(F.col("g"), 6)) & (F.col("d") <= F.col("g")),
        )
        .groupBy(F.col("g").alias("d"))
        .agg(F.count_distinct("user_id").alias("users_7d"))
    )


# --- order-insensitive table checksum --------------------------------------
_CHECKSUM_SQL = """
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(o_orderdate AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      FROM orders
    )
    SELECT count(*) AS n_rows, sum(hv) AS checksum FROM h
"""


@register("table_checksum_orders", _CHECKSUM_SQL)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("string"),
    )
    hv = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("long")
    return o.select(hv.alias("hv")).agg(
        F.count("*").alias("n_rows"), F.sum("hv").alias("checksum")
    )
