"""Seventy-second oracle-registry module: spectral graph partitioning
and LM continuation-mass analysis.

  * spectral_cut_events — spectral bisection of the user
    co-occurrence graph: 3 unrolled power-iteration rounds on
    (cI − L) (L the graph Laplacian, c = max degree + 1, so the
    Fiedler direction dominates once the all-ones component is
    projected out each round), per-round re-orthogonalization
    against 1, normalization, and rounding — the same unrolled
    determinism as PCA/HITS.  Nodes split by iterate sign
    (0 ties to side 0 with id tiebreak via sign ordering);
    emits each side's size and the EDGE CUT vs the hash-split cut —
    the graph-partitioning decision (spectral placement vs naive
    hashing) that decides shuffle volume for iterated graph jobs.

  * topp_contexts_docs — top-p (nucleus) continuation mass: for the
    20 most frequent context tokens, the smallest continuation set
    covering 90% of observed bigram continuations (integer-exact
    threshold comparison, the per-group form of vocab_coverage) plus
    the continuation entropy.  The LM-head analysis behind sampler
    truncation settings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# spectral_cut_events
# ---------------------------------------------------------------------------

_SC_ROUNDS = 3


def _spectral_sql() -> str:
    blocks = [
        """ev AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hb
      FROM events WHERE user_id < 40
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM ev a JOIN ev b
        ON a.event_type = b.event_type AND a.hb = b.hb AND a.user_id < b.user_id
    ),
    und AS MATERIALIZED (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
    deg AS MATERIALIZED (SELECT a AS node, COUNT(*) AS d FROM und GROUP BY a),
    cc AS (SELECT MAX(d) + 1.0 AS c FROM deg),
    x0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN CAST(('0x' || substr(md5('sc#' || CAST(node AS VARCHAR)), 1, 4))
                       AS INTEGER) % 2 = 0 THEN 1.0 ELSE -1.0 END AS xv
      FROM deg
    )"""
    ]
    for r in range(1, _SC_ROUNDS + 1):
        p = r - 1
        blocks.append(
            f"""m{r} AS MATERIALIZED (
      -- y = (cI - L)x = (c - d)*x + sum_neighbors(x)
      SELECT d.node,
             ((SELECT c FROM cc) - d.d) * x.xv + COALESCE(nb.s, 0.0) AS yv
      FROM deg d
      JOIN x{p} x ON x.node = d.node
      LEFT JOIN (
        SELECT und.a AS node, SUM(x2.xv) AS s
        FROM und JOIN x{p} x2 ON und.b = x2.node GROUP BY und.a
      ) nb ON nb.node = d.node
    ),
    o{r} AS (
      SELECT node, yv - (SELECT AVG(yv) FROM m{r}) AS ov FROM m{r}
    ),
    n{r} AS (SELECT sqrt(SUM(ov * ov)) AS nrm FROM o{r}),
    x{r} AS MATERIALIZED (SELECT node, round(ov / (SELECT nrm FROM n{r}), 6) AS xv FROM o{r})"""
        )
    last = f"x{_SC_ROUNDS}"
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f""",
    sides AS (
      SELECT node, CASE WHEN xv > 0 THEN 1 ELSE 0 END AS side FROM {last}
    ),
    spectral_cut AS (
      SELECT COUNT(*) / 2 AS cut
      FROM und JOIN sides sa ON und.a = sa.node JOIN sides sb ON und.b = sb.node
      WHERE sa.side <> sb.side
    ),
    hash_cut AS (
      SELECT COUNT(*) / 2 AS cut
      FROM und
      WHERE (und.a % 2) <> (und.b % 2)
    )
    SELECT (SELECT COUNT(*) FROM sides WHERE side = 1) AS n_side1,
           (SELECT COUNT(*) FROM sides WHERE side = 0) AS n_side0,
           (SELECT cut FROM spectral_cut) AS spectral_edge_cut,
           (SELECT cut FROM hash_cut) AS hash_edge_cut,
           (SELECT COUNT(*) FROM und) / 2 AS n_edges
    """
    )


@register("spectral_cut_events", _spectral_sql())
def spectral_cut_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hb"))
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    und = e0.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        e0.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    c = deg.agg((F.max("d") + 1.0).alias("c"))
    x = deg.select(
        "node",
        F.when(
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("sc#"), F.col("node").cast("string"))), 1, 4),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            1.0,
        ).otherwise(-1.0).alias("xv"),
    )
    spark_s = x.sparkSession
    for _ in range(_SC_ROUNDS):
        nb = (
            und.join(x.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.sum("xv").alias("s"))
        )
        m = (
            deg.join(x, "node")
            .join(nb, "node", "left")
            .crossJoin(c)
            .select(
                "node",
                ((F.col("c") - F.col("d")) * F.col("xv") + F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "yv"
                ),
            )
        )
        mean = m.agg(F.avg("yv").alias("mu"))
        o = m.crossJoin(mean).select("node", (F.col("yv") - F.col("mu")).alias("ov"))
        nrm = o.agg(F.sqrt(F.sum(F.col("ov") * F.col("ov"))).alias("nrm"))
        x = o.crossJoin(nrm).select("node", F.round(F.col("ov") / F.col("nrm"), 6).alias("xv"))
        # Break lineage per round: the iterate references its
        # predecessor three times (neighbor sum, mean, norm), so the
        # unmaterialized plan recomputes the whole history 3^r times —
        # the iterate is node-count-sized, so a driver round-trip is
        # the cheapest checkpoint (the cluster-scale form is
        # localCheckpoint(), as in operators/graph.py's loops).
        x = spark_s.createDataFrame(x.collect(), "node long, xv double")
    sides = x.select("node", F.when(F.col("xv") > 0, 1).otherwise(0).alias("side"))
    sa = sides.withColumnRenamed("node", "a").withColumnRenamed("side", "side_a")
    sb = sides.withColumnRenamed("node", "b").withColumnRenamed("side", "side_b")
    scut = (
        und.join(sa, "a").join(sb, "b")
        .filter(F.col("side_a") != F.col("side_b"))
        .agg((F.count("*") / 2).cast("long").alias("spectral_edge_cut"))
    )
    hcut = und.filter(F.pmod(F.col("a"), F.lit(2)) != F.pmod(F.col("b"), F.lit(2))).agg(
        (F.count("*") / 2).cast("long").alias("hash_edge_cut")
    )
    n1 = sides.filter(F.col("side") == 1).agg(F.count("*").alias("n_side1"))
    n0 = sides.filter(F.col("side") == 0).agg(F.count("*").alias("n_side0"))
    ne = und.agg((F.count("*") / 2).cast("long").alias("n_edges"))
    return n1.crossJoin(n0).crossJoin(scut).crossJoin(hcut).crossJoin(ne)


# ---------------------------------------------------------------------------
# topp_contexts_docs
# ---------------------------------------------------------------------------

_TOPP_SQL = r"""
    WITH arrs AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents
    ),
    bigrams AS (
      SELECT ts[i] AS ctx, ts[i + 1] AS nxt
      FROM arrs, (SELECT unnest(range(1, 2000)) AS i) r
      WHERE i + 1 <= len(ts)
    ),
    ctx_tot AS (
      SELECT ctx, COUNT(*) AS n_ctx FROM bigrams GROUP BY ctx
    ),
    top_ctx AS (
      SELECT ctx, n_ctx FROM (
        SELECT ctx, n_ctx, row_number() OVER (ORDER BY n_ctx DESC, ctx) AS rk
        FROM ctx_tot) WHERE rk <= 20
    ),
    cont AS (
      SELECT b.ctx, b.nxt, COUNT(*) AS c
      FROM bigrams b JOIN top_ctx t ON b.ctx = t.ctx
      GROUP BY b.ctx, b.nxt
    ),
    cum AS (
      SELECT ctx, nxt, c,
             SUM(c) OVER (PARTITION BY ctx ORDER BY c DESC, nxt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             row_number() OVER (PARTITION BY ctx ORDER BY c DESC, nxt) AS rk,
             SUM(c) OVER (PARTITION BY ctx) AS tot
      FROM cont
    )
    SELECT ctx,
           MIN(tot) AS n_continuations_obs,
           COUNT(*) AS vocab_cont,
           MIN(CASE WHEN cum_c * 10 >= tot * 9 THEN rk END) AS top_p90_size,
           ROUND(SUM(-(c * 1.0 / tot) * log2(c * 1.0 / tot)), 6) AS cont_entropy
    FROM cum GROUP BY ctx
"""


@register("topp_contexts_docs", _TOPP_SQL)
def topp_contexts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    arrs = d.select(F.split(F.lower(F.trim("text")), r"\s+").alias("ts"))
    bigrams = arrs.select(
        F.explode(
            F.expr("transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS ctx, ts[i+1] AS nxt))")
        ).alias("bg")
    ).select("bg.ctx", "bg.nxt")
    ctx_tot = bigrams.groupBy("ctx").agg(F.count("*").alias("n_ctx"))
    wtop = Window.orderBy(F.desc("n_ctx"), F.asc("ctx"))
    top_ctx = (
        ctx_tot.select("ctx", "n_ctx", F.row_number().over(wtop).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("ctx")
    )
    cont = bigrams.join(top_ctx, "ctx").groupBy("ctx", "nxt").agg(F.count("*").alias("c"))
    wcum = Window.partitionBy("ctx").orderBy(F.desc("c"), F.asc("nxt")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("ctx")
    cum = cont.select(
        "ctx",
        "c",
        F.sum("c").over(wcum).alias("cum_c"),
        F.row_number()
        .over(Window.partitionBy("ctx").orderBy(F.desc("c"), F.asc("nxt")))
        .alias("rk"),
        F.sum("c").over(wtot).alias("tot"),
    )
    return cum.groupBy("ctx").agg(
        F.min("tot").alias("n_continuations_obs"),
        F.count("*").alias("vocab_cont"),
        F.min(F.when(F.col("cum_c") * 10 >= F.col("tot") * 9, F.col("rk"))).alias(
            "top_p90_size"
        ),
        F.round(
            F.sum(-(F.col("c") * 1.0 / F.col("tot")) * F.log2(F.col("c") * 1.0 / F.col("tot"))),
            6,
        ).alias("cont_entropy"),
    )
