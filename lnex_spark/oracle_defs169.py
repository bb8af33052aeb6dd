"""Hundred-sixty-ninth oracle-registry module: language-model
retrieval scoring and consensus-based robust regression.

  * dirichlet_ql_docs — query-likelihood retrieval with Dirichlet
    smoothing (mu = 100) for the query {spark, table, join}:
    score(d) = sum_q ln((tf_{q,d} + mu * P(q|C)) / (|d| + mu)) with
    corpus unigram P(q|C).  The third classical ranking family next
    to bm25_scores and tfidf_cosine_docs — smoothing by corpus prior
    instead of idf, the standard baseline in IR evaluation; top 15
    by (score, doc_id).

  * ransac_line_events — RANSAC line fit of daily mean value vs day
    index made fully deterministic the registry way: 16 hypothesis
    pairs drawn by md5-hash arithmetic (i = H(b) mod n, j offset by
    1 + H'(b) mod (n-1), so i != j always), each pair's exact line
    scored by inlier count at |residual| <= 2.0, winner = max
    inliers with smallest hypothesis id.  Reports the consensus
    line and its inlier share next to the OLS slope — when the two
    disagree, the series has outlier days that corrupt least
    squares (cross-check: theilsen_events, the other robust fit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MU = 100.0
_QTERMS = ("spark", "table", "join")
_B = 16
_THR = 2.0


_QL_SQL = f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    dlen AS (SELECT doc_id, COUNT(*) AS dl FROM clean GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS ct FROM clean),
    pq AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) / (SELECT ct FROM corpus) AS p
      FROM clean WHERE tok IN {_QTERMS!r} GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM clean
      WHERE tok IN {_QTERMS!r} GROUP BY doc_id, tok
    ),
    scored AS (
      SELECT d.doc_id,
             SUM(LN((COALESCE(t.tf, 0) + {_MU!r} * q.p) / (d.dl + {_MU!r})))
               AS score
      FROM dlen d
      CROSS JOIN pq q
      LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.tok = q.tok
      GROUP BY d.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS ql_score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 15
"""


@register("dirichlet_ql_docs", _QL_SQL)
def dirichlet_ql_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    dlen = clean.groupBy("doc_id").agg(F.count("*").alias("dl"))
    ct = clean.count()
    pq = (
        clean.where(F.col("tok").isin(*_QTERMS))
        .groupBy("tok")
        .agg((F.count("*").cast("double") / F.lit(ct)).alias("p"))
    )
    tf = (
        clean.where(F.col("tok").isin(*_QTERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        dlen.crossJoin(F.broadcast(pq))
        .join(tf, ["doc_id", "tok"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + _MU * F.col("p"))
                    / (F.col("dl") + _MU)
                )
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(15)
        .select("doc_id", F.round("score", 6).alias("ql_score"))
    )


_RANSAC_SQL = f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    pts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS DOUBLE) AS x, y
      FROM daily
    ),
    n AS (SELECT COUNT(*) AS n FROM pts),
    hyp AS (
      SELECT b,
             CAST(('0x' || substr(md5('ransac-i#' || CAST(b AS VARCHAR)),
                   1, 4)) AS INTEGER) % (SELECT n FROM n) AS i,
             (CAST(('0x' || substr(md5('ransac-i#' || CAST(b AS VARCHAR)),
                    1, 4)) AS INTEGER) % (SELECT n FROM n)
              + 1
              + CAST(('0x' || substr(md5('ransac-j#' || CAST(b AS VARCHAR)),
                      1, 4)) AS INTEGER) % ((SELECT n FROM n) - 1))
             % (SELECT n FROM n) AS j
      FROM (SELECT UNNEST(range(1, {_B + 1})) AS b)
    ),
    lines AS (
      SELECT h.b,
             (pj.y - pi.y) / (pj.x - pi.x) AS slope,
             pi.y - (pj.y - pi.y) / (pj.x - pi.x) * pi.x AS icpt
      FROM hyp h
      JOIN pts pi ON pi.x = h.i
      JOIN pts pj ON pj.x = h.j
    ),
    votes AS (
      SELECT l.b, l.slope, l.icpt,
             SUM(CASE WHEN ABS(p.y - (l.icpt + l.slope * p.x))
                      <= {_THR!r} THEN 1 ELSE 0 END) AS inliers
      FROM lines l CROSS JOIN pts p
      GROUP BY l.b, l.slope, l.icpt
    )
    SELECT CAST(b AS BIGINT) AS hypothesis,
           ROUND(slope, 6) AS slope,
           ROUND(icpt, 6) AS intercept,
           CAST(inliers AS BIGINT) AS inliers,
           ROUND(CAST(inliers AS DOUBLE) / (SELECT n FROM n), 6)
             AS inlier_frac
    FROM votes
    ORDER BY inliers DESC, b
    LIMIT 1
"""


@register("ransac_line_events", _RANSAC_SQL)
def ransac_line_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    pts = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("double")
        .alias("x"),
        "y",
    )
    n = pts.count()

    def h(salt):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("b").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")

    hyp = (
        ev.sparkSession.range(1, _B + 1)
        .select(F.col("id").alias("b"))
        .select(
            "b",
            (h("ransac-i#") % n).alias("i"),
            ((h("ransac-i#") % n + 1 + h("ransac-j#") % (n - 1)) % n).alias(
                "j"
            ),
        )
    )
    pi = pts.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    pj = pts.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    slope = (F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))
    lines = (
        hyp.join(F.broadcast(pi), F.col("xi") == F.col("i"))
        .join(F.broadcast(pj), F.col("xj") == F.col("j"))
        .select(
            "b",
            slope.alias("slope"),
            (F.col("yi") - slope * F.col("xi")).alias("icpt"),
        )
    )
    votes = (
        lines.crossJoin(pts)
        .groupBy("b", "slope", "icpt")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("y") - (F.col("icpt") + F.col("slope") * F.col("x"))
                    )
                    <= _THR,
                    1,
                ).otherwise(0)
            ).alias("inliers")
        )
    )
    return (
        votes.orderBy(F.desc("inliers"), "b")
        .limit(1)
        .select(
            F.col("b").cast("long").alias("hypothesis"),
            F.round("slope", 6).alias("slope"),
            F.round("icpt", 6).alias("intercept"),
            F.col("inliers").cast("long").alias("inliers"),
            F.round(F.col("inliers").cast("double") / n, 6).alias(
                "inlier_frac"
            ),
        )
    )
