"""Hundred-twenty-seventh oracle-registry module: coverage times and
resampling identities.

  * coupon_collector_events — the coupon-collector coverage time:
    per user, the position of the first event at which all five
    event types have been seen (running distinct count via
    first-occurrence cumsum — no quadratic scan), mean observed
    coverage time against the n·H_n = 11.416… theory.  "How much
    traffic until every category is exercised" — the coverage-time
    budget behind smoke tests, crawler completeness, and
    stratified-monitoring windows.

  * jackknife_identity_events — the delete-one jackknife variance of
    the mean computed from the algebraic leave-one-out identity
    (each LOO mean = (S − x_i)/(n−1), all from two sums — no n-fold
    fan-out) next to the classic SE² = s²/n, per event type.  For
    the mean these agree EXACTLY ((n−1)/n · population variance
    /(n−1) algebra) — emitted as a checked identity, pinning that
    the resampling machinery (bootstrap/CV/permutation ops) sits on
    sums that merge, the same contract as moments_merge_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CC_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS occ
      FROM events
    ),
    flagged AS (
      SELECT user_id, pos,
             SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen
      FROM ordered
    ),
    cover AS (
      SELECT user_id, MIN(pos) AS cover_pos
      FROM flagged WHERE seen = 5 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users_covered,
           ROUND(AVG(cover_pos * 1.0), 6) AS mean_cover_time,
           CAST(MIN(cover_pos) AS BIGINT) AS min_cover_time,
           CAST(MAX(cover_pos) AS BIGINT) AS max_cover_time,
           ROUND(5.0 * (1.0 + 1.0/2 + 1.0/3 + 1.0/4 + 1.0/5), 6)
             AS theory_mean
    FROM cover
"""


@register("coupon_collector_events", _CC_SQL)
def coupon_collector_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wk = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        F.row_number().over(w).alias("pos"),
        F.row_number().over(wk).alias("occ"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ordered.select(
        "user_id",
        "pos",
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0)).over(wcum).alias("seen"),
    )
    cover = (
        flagged.filter(F.col("seen") == 5)
        .groupBy("user_id")
        .agg(F.min("pos").alias("cover_pos"))
    )
    theory = 5.0 * (1.0 + 1.0 / 2 + 1.0 / 3 + 1.0 / 4 + 1.0 / 5)
    return cover.agg(
        F.count("*").cast("long").alias("n_users_covered"),
        F.round(F.avg(F.col("cover_pos") * 1.0), 6).alias("mean_cover_time"),
        F.min("cover_pos").cast("long").alias("min_cover_time"),
        F.max("cover_pos").cast("long").alias("max_cover_time"),
        F.round(F.lit(theory), 6).alias("theory_mean"),
    )


_JK_SQL = """
    WITH mom AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS s2
      FROM events GROUP BY event_type
    ),
    calc AS (
      SELECT event_type, n,
             (s2 - s * s / n) / (n - 1.0) / n AS se2_classic,
             -- jackknife: (n-1)/n * sum_i (loo_mean_i - mean)^2,
             -- with loo_mean_i - mean = (mean - x_i)/(n-1) algebraically:
             (n - 1.0) / n * ((s2 - s * s / n) / pow(n - 1.0, 2)) AS se2_jackknife
      FROM mom
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(se2_classic, 9) AS se2_classic,
           ROUND(se2_jackknife, 9) AS se2_jackknife,
           CAST(ROUND(se2_classic, 9) = ROUND(se2_jackknife, 9) AS INTEGER)
             AS identity_holds
    FROM calc
"""


@register("jackknife_identity_events", _JK_SQL)
def jackknife_identity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mom = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    css = (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
    se2_classic = css / (F.col("n") - 1.0) / F.col("n")
    se2_jack = (F.col("n") - 1.0) / F.col("n") * (css / F.pow(F.col("n") - 1.0, 2))
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(se2_classic, 9).alias("se2_classic"),
        F.round(se2_jack, 9).alias("se2_jackknife"),
        (F.round(se2_classic, 9) == F.round(se2_jack, 9)).cast("int").alias(
            "identity_holds"
        ),
    )
