"""Hundred-thirty-eighth oracle-registry module: paired
nonparametric tests — the matched-samples counterparts of
mann_whitney_events (oracle_defs129), for day-over-day metric
comparisons where the pairing (same day, two event types) removes
the between-day variance an unpaired test would drown in:

  * wilcoxon_signed_rank_events — Wilcoxon signed-rank over the
    paired (click total, view total) per day: zero differences
    dropped (Wilcoxon's original treatment), |d| average-ranked
    with the value-level rank construction (count-below +
    (ties+1)/2 — the shuffle is distinct-|d|-sized), W+ = Σ ranks
    of positive differences, and the normal approximation
    z = (W+ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    with the exact tie correction.  No continuity correction on
    either side, by construction.  The day table is bounded (one
    row per day), so every window here is day-sized.

  * sign_test_events — the exact paired sign test on the same
    day-pairs: k = #days click > view out of n nonzero differences,
    one-sided p = Σ_{j≥k} C(n,j) / 2^n computed from a log-factorial
    table built by sequence + cumsum (the fisher_exact_events
    discipline — no lgamma dependency), distribution-free even when
    the signed-rank symmetry assumption fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PAIRS_SQL = """
      SELECT date_trunc('day', ts) AS day,
             SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END)
               - SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END)
               AS d
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY 1
"""

_WSR_SQL = f"""
    WITH pairs AS ({_PAIRS_SQL}),
    nz AS (SELECT ABS(d) AS ad, d > 0 AS pos FROM pairs WHERE d <> 0),
    vals AS (
      SELECT ad, COUNT(*) AS t,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS t_pos
      FROM nz GROUP BY ad
    ),
    ranked AS (
      SELECT ad, t, t_pos,
             COALESCE(SUM(t) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (t + 1) / 2.0 AS rank_avg
      FROM vals
    ),
    stats AS (
      SELECT SUM(t) AS n,
             SUM(t_pos * rank_avg) AS w_plus,
             SUM(POW(t, 3) - t) AS tie_term
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(w_plus, 4) AS w_plus,
           ROUND((w_plus - n * (n + 1) / 4.0)
                 / SQRT(n * (n + 1) * (2 * n + 1) / 24.0
                        - tie_term / 48.0), 6) AS z
    FROM stats
"""


@register("wilcoxon_signed_rank_events", _WSR_SQL)
def wilcoxon_signed_rank_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    pairs = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0))
            - F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0))
        ).alias("d")
    )
    nz = pairs.filter(F.col("d") != 0).select(
        F.abs("d").alias("ad"), (F.col("d") > 0).alias("pos")
    )
    vals = nz.groupBy("ad").agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("t_pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "t",
        "t_pos",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0))
            + (F.col("t") + 1) / 2.0
        ).alias("rank_avg"),
    )
    return ranked.agg(
        F.sum("t").cast("long").alias("n_pairs_raw"),
        F.sum(F.col("t_pos") * F.col("rank_avg")).alias("w_plus_raw"),
        F.sum(F.pow("t", 3) - F.col("t")).alias("tie_term"),
    ).select(
        F.col("n_pairs_raw").alias("n_pairs"),
        F.round("w_plus_raw", 4).alias("w_plus"),
        F.round(
            (
                F.col("w_plus_raw")
                - F.col("n_pairs_raw") * (F.col("n_pairs_raw") + 1) / 4.0
            )
            / F.sqrt(
                F.col("n_pairs_raw")
                * (F.col("n_pairs_raw") + 1)
                * (2 * F.col("n_pairs_raw") + 1)
                / 24.0
                - F.col("tie_term") / 48.0
            ),
            6,
        ).alias("z"),
    )


_SIGN_SQL = f"""
    WITH pairs AS ({_PAIRS_SQL}),
    counts AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS k
      FROM pairs WHERE d <> 0
    ),
    seq AS (
      SELECT unnest(range(0, (SELECT CAST(n AS BIGINT) FROM counts) + 1))
        AS i
    ),
    lfact AS (
      SELECT i,
             SUM(CASE WHEN i2 > 0 THEN LN(CAST(i2 AS DOUBLE)) ELSE 0 END)
               AS lf
      FROM (SELECT a.i, b.i AS i2 FROM seq a JOIN seq b ON b.i <= a.i)
      GROUP BY i
    ),
    tail AS (
      SELECT c.n, c.k,
             SUM(EXP(n_f.lf - j_f.lf - nj_f.lf
                     - c.n * LN(2.0))) AS p_one_sided
      FROM counts c
      JOIN seq j ON j.i >= c.k AND j.i <= c.n
      JOIN lfact n_f ON n_f.i = c.n
      JOIN lfact j_f ON j_f.i = j.i
      JOIN lfact nj_f ON nj_f.i = c.n - j.i
      GROUP BY c.n, c.k
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(k AS BIGINT) AS n_positive,
           ROUND(p_one_sided, 6) AS p_one_sided
    FROM tail
"""


@register("sign_test_events", _SIGN_SQL)
def sign_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    pairs = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0))
            - F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0))
        ).alias("d")
    )
    counts = pairs.filter(F.col("d") != 0).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("k"),
    )
    seq = counts.select(
        "n", "k", F.explode(F.sequence(F.lit(0), F.col("n"))).alias("i")
    )
    lf = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    lfact = seq.select(
        "n",
        "k",
        "i",
        F.sum(
            F.when(F.col("i") > 0, F.log(F.col("i").cast("double"))).otherwise(
                0.0
            )
        )
        .over(lf)
        .alias("lf"),
    )
    n_f = lfact.filter(F.col("i") == F.col("n")).select(
        F.col("lf").alias("lf_n")
    )
    terms = (
        lfact.filter(F.col("i") >= F.col("k"))
        .crossJoin(F.broadcast(n_f))
        .alias("j")
    )
    nj = lfact.select(F.col("i").alias("nj_i"), F.col("lf").alias("lf_nj"))
    joined = terms.join(
        F.broadcast(nj), F.col("nj_i") == F.col("n") - F.col("i")
    )
    return joined.groupBy("n", "k").agg(
        F.round(
            F.sum(
                F.exp(
                    F.col("lf_n")
                    - F.col("lf")
                    - F.col("lf_nj")
                    - F.col("n") * F.log(F.lit(2.0))
                )
            ),
            6,
        ).alias("p_one_sided")
    ).select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("k").cast("long").alias("n_positive"),
        "p_one_sided",
    )
