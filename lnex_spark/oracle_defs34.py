"""Thirty-fourth oracle-registry module: inverted-index phrase query,
changepoint detection, FD profiling, and information gain.

  * phrase_query_docs — positional inverted index + phrase query:
    build (term, doc, pos) postings and answer the phrase "value
    table" by a postings self-join on pos+1 adjacency — the IR-engine
    formulation; the DuckDB twin scans token arrays directly for
    adjacent matches.  Index-based retrieval must equal scan-based
    truth — the invariant every search index is built on.
  * changepoint_events — best two-segment split of the daily value
    series: per candidate split day, SSE of both segments from
    prefix sums of (cnt, sum, sumsq) — the O(n) closed form of the
    single-changepoint least-squares scan (drift LOCALIZATION, where
    PSI/KS only detect).  Argmin under a fully-specified (sse, day)
    order; windows run over the day-count-sized daily table.
  * fd_check_orders — functional-dependency profiling: violation
    counts for three candidate FDs (determinant groups with >1
    distinct dependent value), the data-profiling primitive behind
    key discovery and normalization checks.
  * infogain_type_user — information gain of the user bucket for
    predicting event_type, H(Y) − H(Y|X), from one contingency
    aggregation: the entropy-based twin of chi2_type_user (feature
    selection, not independence testing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- inverted-index phrase query -------------------------------------------
_PHRASE_SQL = r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE len(trim(text)) > 0
    ),
    hits AS (
      SELECT doc_id, i FROM d, unnest(range(1, len(t))) AS r(i)
      WHERE t[CAST(i AS INT)] = 'value' AND t[CAST(i + 1 AS INT)] = 'table'
    )
    SELECT doc_id, count(*) AS n_occurrences FROM hits GROUP BY doc_id
"""


@register("phrase_query_docs", _PHRASE_SQL)
def phrase_query_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search the index way: positional postings (term, doc,
    pos) self-joined on (doc, pos+1) adjacency for 'value table'.
    The postings build is one explode; the phrase join keys on
    (term-filtered) doc+pos — both sides of the join are tiny after
    the term filter, which is exactly why inverted indexes win.  The
    oracle scans the token arrays directly: index == scan."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
        )
    )
    postings = d.select("doc_id", F.posexplode("t").alias("pos", "term"))
    p1 = postings.filter(F.col("term") == "value").select("doc_id", "pos")
    p2 = postings.filter(F.col("term") == "table").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


# --- single changepoint of the daily value series --------------------------
_CHANGEPOINT_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS cnt,
             sum(value) AS s, sum(value * value) AS ss
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT d,
             sum(cnt) OVER w AS cl, sum(s) OVER w AS sl, sum(ss) OVER w AS ssl,
             sum(cnt) OVER () AS ct, sum(s) OVER () AS st, sum(ss) OVER () AS sst,
             row_number() OVER (ORDER BY d) AS rn,
             count(*) OVER () AS nd
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cand AS (
      SELECT d AS split_day,
             (ssl - sl * sl / cl)
               + ((sst - ssl) - (st - sl) * (st - sl) / (ct - cl)) AS sse,
             sl / cl AS left_mean, (st - sl) / (ct - cl) AS right_mean
      FROM pre WHERE rn < nd
    )
    SELECT split_day, round(sse, 6) AS sse,
           round(left_mean, 6) AS left_mean, round(right_mean, 6) AS right_mean
    FROM (
      SELECT *, row_number() OVER (ORDER BY sse ASC, split_day ASC) AS rk
      FROM cand) WHERE rk = 1
"""


@register("changepoint_events", _CHANGEPOINT_SQL)
def changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    pre = daily.select(
        "d",
        F.sum("cnt").over(w).alias("cl"),
        F.sum("s").over(w).alias("sl"),
        F.sum("ss").over(w).alias("ssl"),
        F.sum("cnt").over(w_all).alias("ct"),
        F.sum("s").over(w_all).alias("st"),
        F.sum("ss").over(w_all).alias("sst"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
        F.count("*").over(w_all).alias("nd"),
    )
    sse = (F.col("ssl") - F.col("sl") * F.col("sl") / F.col("cl")) + (
        (F.col("sst") - F.col("ssl"))
        - (F.col("st") - F.col("sl"))
        * (F.col("st") - F.col("sl"))
        / (F.col("ct") - F.col("cl"))
    )
    cand = pre.filter(F.col("rn") < F.col("nd")).select(
        F.col("d").alias("split_day"),
        sse.alias("sse"),
        (F.col("sl") / F.col("cl")).alias("left_mean"),
        ((F.col("st") - F.col("sl")) / (F.col("ct") - F.col("cl"))).alias(
            "right_mean"
        ),
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("sse").asc(), F.col("split_day").asc())
    )
    return (
        cand.select(
            "split_day",
            F.round("sse", 6).alias("sse"),
            F.round("left_mean", 6).alias("left_mean"),
            F.round("right_mean", 6).alias("right_mean"),
            rk.alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# --- functional-dependency profiling ---------------------------------------
_FD_SQL = """
    SELECT 'o_custkey->o_orderpriority' AS fd,
           count(*) AS n_groups,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
           round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS violation_rate
    FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
          FROM orders GROUP BY o_custkey)
    UNION ALL
    SELECT 'p_brand->p_type', count(*),
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END),
           round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    FROM (SELECT p_brand, count(DISTINCT p_type) AS nd FROM part GROUP BY p_brand)
    UNION ALL
    SELECT 'l_orderkey->l_returnflag', count(*),
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END),
           round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd
          FROM lineitem GROUP BY l_orderkey)
"""


@register("fd_check_orders", _FD_SQL)
def fd_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation profile for three candidate functional dependencies —
    one distinct-count aggregation per determinant, the profiling
    primitive behind key discovery; a zero violation_rate certifies
    the FD on this corpus, a high one refutes it."""

    def one(df: DataFrame, det: str, dep: str) -> DataFrame:
        g = df.groupBy(det).agg(F.count_distinct(dep).alias("nd"))
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        return g.agg(
            F.lit(f"{det}->{dep}").alias("fd"),
            F.count("*").alias("n_groups"),
            viol.alias("n_violating"),
            F.round(viol * 1.0 / F.count("*"), 6).alias("violation_rate"),
        )

    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        one(o, "o_custkey", "o_orderpriority")
        .unionByName(one(p, "p_brand", "p_type"))
        .unionByName(one(li, "l_orderkey", "l_returnflag"))
    )


# --- information gain of user bucket for event_type ------------------------
_IG_SQL = """
    WITH c AS (
      SELECT event_type AS y, user_id % 4 AS x, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS t FROM c),
    hy AS (
      SELECT -sum((ny * 1.0 / t) * ln(ny * 1.0 / t)) AS h
      FROM (SELECT y, sum(n) AS ny FROM c GROUP BY y) CROSS JOIN tot
    ),
    px AS (
      SELECT x, n,
             n * 1.0 / sum(n) OVER (PARTITION BY x) AS p,
             sum(n) OVER (PARTITION BY x) AS nx
      FROM c
    ),
    hx AS (SELECT x, max(nx) AS nx, -sum(p * ln(p)) AS hx FROM px GROUP BY x),
    hyx AS (
      SELECT sum((nx * 1.0 / t) * hx) AS h FROM hx CROSS JOIN tot
    )
    SELECT round(hy.h, 6) AS h_y, round(hyx.h, 6) AS h_y_given_x,
           round(hy.h - hyx.h, 6) AS info_gain
    FROM hy CROSS JOIN hyx
"""


@register("infogain_type_user", _IG_SQL)
def infogain_type_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain IG(Y; X) = H(Y) − H(Y|X) for Y = event_type,
    X = user_id % 4, from one contingency aggregation — the
    feature-selection twin of chi2_type_user."""
    c = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("y"), (F.col("user_id") % 4).alias("x")
        )
        .agg(F.count("*").alias("n"))
    )
    tot = c.agg(F.sum("n").alias("t"))
    hy = (
        c.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum((F.col("ny") * 1.0 / F.col("t")) * F.log(F.col("ny") * 1.0 / F.col("t")))).alias("h")
        )
    )
    w_x = Window.partitionBy("x")
    inner = c.select(
        "x",
        "n",
        (F.col("n") * 1.0 / F.sum("n").over(w_x)).alias("p"),
        F.sum("n").over(w_x).alias("nx_all"),
    )
    hx = inner.groupBy("x").agg(
        F.max("nx_all").alias("nx"), (-F.sum(F.col("p") * F.log("p"))).alias("hx")
    )
    hyx = hx.crossJoin(F.broadcast(tot)).agg(
        F.sum((F.col("nx") * 1.0 / F.col("t")) * F.col("hx")).alias("h")
    )
    return (
        hy.withColumnRenamed("h", "hy_raw")
        .crossJoin(hyx.withColumnRenamed("h", "hyx_raw"))
        .select(
            F.round("hy_raw", 6).alias("h_y"),
            F.round("hyx_raw", 6).alias("h_y_given_x"),
            F.round(F.col("hy_raw") - F.col("hyx_raw"), 6).alias("info_gain"),
        )
    )
