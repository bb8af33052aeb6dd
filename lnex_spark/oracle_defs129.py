"""Hundred-twenty-ninth oracle-registry module: nonparametric rank
tests — the distribution-free counterparts of welch_ttest_events /
anova (oracle_defs104) for the skewed, outlier-heavy metrics a
transcript pipeline actually produces.

  * mann_whitney_events — Mann-Whitney U (Wilcoxon rank-sum) between
    the click and view value samples.  Average ranks come from a
    value-level aggregation (count per distinct value + cumulative
    count), NOT a per-row ranking window: rank_avg(v) = (#rows below)
    + (ties+1)/2, so the shuffle is distinct-value-sized and the only
    global window runs over distinct values (the KS-op discipline).
    Emits U, the normal-approximation z with the exact tie
    correction Σ(t³−t)/(N(N−1)), and both sample sizes.  No
    continuity correction on either side, by construction.

  * kruskal_wallis_events — Kruskal-Wallis H across all five event
    types: per-group mean ranks from the same value-level rank table,
    H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), divided by the tie
    correction 1 − Σ(t³−t)/(N³−N).  One row per group carries its
    n and mean rank next to the (corrected) global H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MW_SQL = """
    WITH pts AS (
      SELECT event_type AS grp, value AS v FROM events
      WHERE event_type IN ('click', 'view')
    ),
    byval AS (
      SELECT v, COUNT(*) AS c,
             SUM(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS c1
      FROM pts GROUP BY v
    ),
    ranked AS (
      SELECT v, c, c1,
             COALESCE(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM byval
    ),
    stats AS (
      SELECT SUM(c1) AS n1,
             SUM(c - c1) AS n2,
             SUM(c) AS n,
             SUM(c1 * (below + (c + 1) / 2.0)) AS r1,
             SUM(POW(c, 3) - c) AS tie_term
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
           ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1) - tie_term / (n * (n - 1.0)))), 6) AS z
    FROM stats
"""


@register("mann_whitney_events", _MW_SQL)
def mann_whitney_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    byval = e.groupBy(F.col("value").alias("v")).agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "c1"
        ),
    )
    # distinct-value-sized global window (bounded input by construction)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byval.withColumn(
        "below", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    stats = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum("c").alias("n"),
        F.sum(F.col("c1") * (F.col("below") + (F.col("c") + 1) / 2.0)).alias(
            "r1"
        ),
        F.sum(F.pow("c", 3) - F.col("c")).alias("tie_term"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_term") / (F.col("n") * (F.col("n") - 1.0))
        )
    )
    return stats.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(u, 6).alias("u_stat"),
        F.round(
            (u - F.col("n1") * F.col("n2") / 2.0) / sigma, 6
        ).alias("z"),
    )


_KW_SQL = """
    WITH grpv AS (
      SELECT event_type AS grp, value AS v, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT v, SUM(c) AS tc FROM grpv GROUP BY v
    ),
    ranked AS (
      SELECT v, tc,
             COALESCE(SUM(tc) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM tot
    ),
    gtot AS (
      SELECT SUM(tc) AS n, SUM(POW(tc, 3) - tc) AS tie_term FROM ranked
    ),
    pergrp AS (
      SELECT g.grp,
             SUM(g.c) AS n_g,
             SUM(g.c * (r.below + (r.tc + 1) / 2.0)) AS r_g
      FROM grpv g JOIN ranked r ON g.v = r.v
      GROUP BY g.grp
    ),
    h AS (
      SELECT (12.0 / (gl.n * (gl.n + 1))
              * SUM(p.r_g * p.r_g / p.n_g) - 3 * (gl.n + 1))
             / (1 - gl.tie_term / (POW(gl.n, 3) - gl.n)) AS h_corr
      FROM pergrp p CROSS JOIN gtot gl
      GROUP BY gl.n, gl.tie_term
    )
    SELECT p.grp,
           CAST(p.n_g AS BIGINT) AS n_g,
           ROUND(p.r_g / p.n_g, 6) AS mean_rank,
           ROUND(h.h_corr, 6) AS h_statistic
    FROM pergrp p CROSS JOIN h
"""


@register("kruskal_wallis_events", _KW_SQL)
def kruskal_wallis_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    grpv = e.groupBy(
        F.col("event_type").alias("grp"), F.col("value").alias("v")
    ).agg(F.count("*").alias("c"))
    tot = grpv.groupBy("v").agg(F.sum("c").alias("tc"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = tot.withColumn(
        "below", F.coalesce(F.sum("tc").over(w), F.lit(0))
    )
    glob = ranked.agg(
        F.sum("tc").alias("n"),
        F.sum(F.pow("tc", 3) - F.col("tc")).alias("tie_term"),
    )
    pergrp = (
        grpv.join(ranked, "v")
        .groupBy("grp")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(
                F.col("c") * (F.col("below") + (F.col("tc") + 1) / 2.0)
            ).alias("r_g"),
        )
    )
    h = (
        pergrp.crossJoin(F.broadcast(glob))
        .groupBy("n", "tie_term")
        .agg(
            (
                (
                    12.0
                    / (F.col("n") * (F.col("n") + 1))
                    * F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g"))
                    - 3 * (F.col("n") + 1)
                )
                / (
                    1
                    - F.col("tie_term")
                    / (F.pow("n", 3) - F.col("n"))
                )
            ).alias("h_corr")
        )
        .select("h_corr")
    )
    return pergrp.crossJoin(F.broadcast(h)).select(
        "grp",
        F.col("n_g").cast("long").alias("n_g"),
        F.round(F.col("r_g") / F.col("n_g"), 6).alias("mean_rank"),
        F.round("h_corr", 6).alias("h_statistic"),
    )
