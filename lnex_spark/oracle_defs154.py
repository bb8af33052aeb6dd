"""Hundred-fifty-fourth oracle-registry module: ordered-attribute
privacy risk and token-set name similarity.

  * t_closeness_customers — t-closeness of every quasi-identifier
    group (c_nationkey, c_mktsegment) for the ORDERED sensitive
    attribute account-balance decile (fixed-width bins
    floor((bal+1000)/1100) clamped to 0..9 — value-anchored, so the
    binning is identical at every scale factor).  Distance is the
    ordered-EMD of Li/Li/Venkatasubramanian: sum of |cumulative
    (p_group - p_global)| over the bin order, / (m-1), computed on a
    DENSE group×bin grid (missing bins count 0).  The release gate
    that k_anonymity_docs / l-diversity miss: a group can be
    k-anonymous and l-diverse yet still leak that its members are
    all in the top balance deciles.

  * monge_elkan_parts — Monge-Elkan token-set similarity between
    adjacent part names (p_partkey % 20 == 0 paired with +1):
    ME(A→B) = mean over tokens a of max_b JW(a, b), both directions
    plus the symmetric mean.  Inner scorer is Jaro-Winkler from two
    INDEPENDENT engines — the vectorized Arrow pandas UDF of
    oracle_defs130 on the Spark side vs DuckDB's native
    ``jaro_winkler_similarity`` — so the oracle genuinely
    cross-checks the implementation, not the formula.  The fuzzy
    matcher for word-reordered names ("Chennai Intl Airport" vs
    "Airport Chennai International") that whole-string JW scores
    poorly — directly relevant to gazetteer alt-name linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TCLOSE_SQL = """
    WITH binned AS (
      SELECT c_nationkey, c_mktsegment,
             LEAST(9, GREATEST(0,
               CAST(FLOOR((c_acctbal + 1000) / 1100) AS INTEGER))) AS b
      FROM customer
    ),
    gdist AS (
      SELECT b, CAST(COUNT(*) AS DOUBLE)
                  / (SELECT COUNT(*) FROM binned) AS pg
      FROM binned GROUP BY b
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n FROM binned
      GROUP BY 1, 2
    ),
    bins AS (SELECT UNNEST(range(0, 10)) AS b),
    grid AS (
      SELECT g.c_nationkey, g.c_mktsegment, g.n, bins.b,
             COALESCE(gl.pg, 0) AS pg
      FROM grp g CROSS JOIN bins LEFT JOIN gdist gl ON gl.b = bins.b
    ),
    cnt AS (
      SELECT c_nationkey, c_mktsegment, b, COUNT(*) AS c
      FROM binned GROUP BY 1, 2, 3
    ),
    diff AS (
      SELECT gr.c_nationkey, gr.c_mktsegment, gr.n, gr.b,
             CAST(COALESCE(cn.c, 0) AS DOUBLE) / gr.n - gr.pg AS d
      FROM grid gr LEFT JOIN cnt cn
        ON cn.c_nationkey = gr.c_nationkey
       AND cn.c_mktsegment = gr.c_mktsegment AND cn.b = gr.b
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n,
             SUM(d) OVER (PARTITION BY c_nationkey, c_mktsegment
                          ORDER BY b) AS cd
      FROM diff
    )
    SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n,
           ROUND(SUM(ABS(cd)) / 9, 6) AS t_emd
    FROM cum
    GROUP BY c_nationkey, c_mktsegment, n
    ORDER BY c_nationkey, c_mktsegment
"""


@register("t_closeness_customers", _TCLOSE_SQL)
def t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    binned = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor((F.col("c_acctbal") + 1000) / 1100).cast("int"),
            ),
        ).alias("b"),
    )
    total = binned.count()
    glob = binned.groupBy("b").agg(
        (F.count("*").cast("double") / F.lit(total)).alias("pg")
    )
    grp = binned.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    bins = c.sparkSession.range(0, 10).select(F.col("id").cast("int").alias("b"))
    grid = grp.crossJoin(F.broadcast(bins)).join(
        F.broadcast(glob), "b", "left"
    ).na.fill({"pg": 0.0})
    cnt = binned.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count("*").alias("c")
    )
    diff = grid.join(
        cnt, ["c_nationkey", "c_mktsegment", "b"], "left"
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        "b",
        (
            F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("n")
            - F.col("pg")
        ).alias("d"),
    )
    wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("b")
    cum = diff.withColumn("cd", F.sum("d").over(wc))
    return (
        cum.groupBy("c_nationkey", "c_mktsegment", "n")
        .agg(F.round(F.sum(F.abs("cd")) / 9, 6).alias("t_emd"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n").cast("long").alias("n"),
            "t_emd",
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


_ME_SQL = """
    WITH pairs AS (
      SELECT a.p_partkey AS k, a.p_name AS na, b.p_name AS nb
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      WHERE a.p_partkey % 20 = 0
    ),
    ta AS (
      SELECT k, na, nb, UNNEST(string_split(na, ' ')) AS tok_a FROM pairs
    ),
    tb AS (
      SELECT k, UNNEST(string_split(nb, ' ')) AS tok_b FROM pairs
    ),
    best_ab AS (
      SELECT ta.k, ta.tok_a,
             MAX(jaro_winkler_similarity(ta.tok_a, tb.tok_b)) AS m
      FROM ta JOIN tb ON ta.k = tb.k
      GROUP BY ta.k, ta.tok_a
    ),
    me_ab AS (
      SELECT k, AVG(m) AS me_ab FROM best_ab GROUP BY k
    ),
    best_ba AS (
      SELECT tb.k, tb.tok_b,
             MAX(jaro_winkler_similarity(tb.tok_b, ta.tok_a)) AS m
      FROM tb JOIN ta ON ta.k = tb.k
      GROUP BY tb.k, tb.tok_b
    ),
    me_ba AS (
      SELECT k, AVG(m) AS me_ba FROM best_ba GROUP BY k
    )
    SELECT a.k AS p_partkey, ROUND(a.me_ab, 6) AS me_ab,
           ROUND(b.me_ba, 6) AS me_ba,
           ROUND((a.me_ab + b.me_ba) / 2, 6) AS me_sym
    FROM me_ab a JOIN me_ba b ON a.k = b.k
    ORDER BY p_partkey
"""


@register("monge_elkan_parts", _ME_SQL)
def monge_elkan_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.oracle_defs130 import _jw_batch

    p = _t(spark, sf_dir, "part")
    a = p.where(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("na")
    )
    b = p.select(F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"))
    pairs = a.join(b, F.col("kb") == F.col("k") + 1).select("k", "na", "nb")
    ta = pairs.select(
        "k", F.explode(F.split("na", " ")).alias("tok_a")
    )
    tb = pairs.select(
        "k", F.explode(F.split("nb", " ")).alias("tok_b")
    )
    jw = F.pandas_udf(_jw_batch, DoubleType())
    tp = ta.join(tb, "k").withColumn("jw", jw("tok_a", "tok_b"))
    me_ab = (
        tp.groupBy("k", "tok_a")
        .agg(F.max("jw").alias("m"))
        .groupBy("k")
        .agg(F.avg("m").alias("me_ab"))
    )
    me_ba = (
        tp.groupBy("k", "tok_b")
        .agg(F.max("jw").alias("m"))
        .groupBy("k")
        .agg(F.avg("m").alias("me_ba"))
    )
    return (
        me_ab.join(me_ba, "k")
        .select(
            F.col("k").alias("p_partkey"),
            F.round("me_ab", 6).alias("me_ab"),
            F.round("me_ba", 6).alias("me_ba"),
            F.round((F.col("me_ab") + F.col("me_ba")) / 2, 6).alias("me_sym"),
        )
        .orderBy("p_partkey")
    )
