"""Hundred-nineteenth oracle-registry module: label-noise estimation
and interference detection.

  * label_noise_docs — confident-learning-style label-noise
    estimation for the binary en/not-en labeling under the
    deterministic logistic score: per-class confidence thresholds =
    the class's mean predicted probability (the CL recipe), an
    example is counted into the off-diagonal of the confident joint
    when its OTHER-class probability clears that class's threshold.
    Emits the estimated noise mass per direction and the implied
    label-error rate — the data-quality step run before trusting any
    labels enough to train on them; exact counts, one pass after
    two mean aggregates.

  * interference_check_events — the spillover/interference
    diagnostic: the same outcome contrast estimated under
    EVENT-level randomization and under USER-level (cluster)
    randomization (both md5 coins).  Under SUTVA the two designs
    estimate the same thing; a gap beyond noise flags interference
    within users — the assumption audit behind every unit-level A/B
    readout in this registry, reported with both effects and the
    gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_LN_SQL = """
    WITH scored AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(n_chars - 400) / 150.0)) AS p_en,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    thr AS (
      SELECT AVG(CASE WHEN y = 1 THEN p_en END) AS t_en,
             AVG(CASE WHEN y = 0 THEN 1.0 - p_en END) AS t_not
      FROM scored
    ),
    joint AS (
      SELECT s.y,
             CASE WHEN s.p_en >= t.t_en THEN 1
                  WHEN 1.0 - s.p_en >= t.t_not THEN 0 END AS confident_class
      FROM scored s CROSS JOIN thr t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN y = 0 AND confident_class = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS est_noisy_not_to_en,
           CAST(SUM(CASE WHEN y = 1 AND confident_class = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS est_noisy_en_to_not,
           ROUND(SUM(CASE WHEN (y = 0 AND confident_class = 1)
                            OR (y = 1 AND confident_class = 0) THEN 1.0
                          ELSE 0.0 END) / COUNT(*), 6) AS est_error_rate
    FROM joint
"""


@register("label_noise_docs", _LN_SQL)
def label_noise_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (1.0 / (1.0 + F.exp(-(F.col("n_chars") - 400) / 150.0))).alias("p_en"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    thr = scored.agg(
        F.avg(F.when(F.col("y") == 1, F.col("p_en"))).alias("t_en"),
        F.avg(F.when(F.col("y") == 0, 1.0 - F.col("p_en"))).alias("t_not"),
    )
    joint = scored.crossJoin(thr).select(
        "y",
        F.when(F.col("p_en") >= F.col("t_en"), 1)
        .when(1.0 - F.col("p_en") >= F.col("t_not"), 0)
        .alias("confident_class"),
    )
    noisy_ne = F.sum(
        F.when((F.col("y") == 0) & (F.col("confident_class") == 1), 1).otherwise(0)
    )
    noisy_en = F.sum(
        F.when((F.col("y") == 1) & (F.col("confident_class") == 0), 1).otherwise(0)
    )
    return joint.agg(
        F.count("*").cast("long").alias("n_docs"),
        noisy_ne.cast("long").alias("est_noisy_not_to_en"),
        noisy_en.cast("long").alias("est_noisy_en_to_not"),
        F.round((noisy_ne + noisy_en) * 1.0 / F.count("*"), 6).alias(
            "est_error_rate"
        ),
    )


_INTF_SQL = """
    WITH base AS (
      SELECT value,
             CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS unit_arm,
             CASE WHEN CAST(('0x' || substr(md5('cluster-v1#' || CAST(user_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS cluster_arm
      FROM events
    ),
    effects AS (
      SELECT
        AVG(CASE WHEN unit_arm = 1 THEN value END)
          - AVG(CASE WHEN unit_arm = 0 THEN value END) AS eff_unit,
        AVG(CASE WHEN cluster_arm = 1 THEN value END)
          - AVG(CASE WHEN cluster_arm = 0 THEN value END) AS eff_cluster,
        COUNT(*) AS n
      FROM base
    )
    SELECT CAST(n AS BIGINT) AS n_events,
           ROUND(eff_unit, 6) AS effect_unit_randomized,
           ROUND(eff_cluster, 6) AS effect_cluster_randomized,
           ROUND(eff_unit - eff_cluster, 6) AS interference_gap
    FROM effects
"""


@register("interference_check_events", _INTF_SQL)
def interference_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def coin(salt_col):
        return F.when(
            F.pmod(
                F.conv(F.substring(F.md5(salt_col), 1, 4), 16, 10).cast("long"),
                F.lit(2),
            )
            == 0,
            1,
        ).otherwise(0)

    base = ev.select(
        "value",
        coin(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))).alias(
            "unit_arm"
        ),
        coin(
            F.concat(F.lit("cluster-v1#"), F.col("user_id").cast("string"))
        ).alias("cluster_arm"),
    )
    eff_u = F.avg(F.when(F.col("unit_arm") == 1, F.col("value"))) - F.avg(
        F.when(F.col("unit_arm") == 0, F.col("value"))
    )
    eff_c = F.avg(F.when(F.col("cluster_arm") == 1, F.col("value"))) - F.avg(
        F.when(F.col("cluster_arm") == 0, F.col("value"))
    )
    return base.agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(eff_u, 6).alias("effect_unit_randomized"),
        F.round(eff_c, 6).alias("effect_cluster_randomized"),
        F.round(eff_u - eff_c, 6).alias("interference_gap"),
    )
