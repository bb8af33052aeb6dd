"""Sixty-fifth oracle-registry module: second-moment sketching,
experiment planning, and feature ranking.

  * ams_f2_events — the AMS (Alon-Matias-Szegedy) F2 sketch: the
    self-join size Σc_k² of the (user, event_type) key estimated by
    (Σ sign_h(k))² per row from md5-derived ±1 signs, median over 5
    independent rows, next to the exact F2.  Like count-min
    (point queries) and HLL (F0), the F2 sketch is a constant-size
    aggregate whatever the key cardinality — the join-size estimator
    a planner can maintain incrementally.

  * power_analysis_events — two-proportion sample-size calculation
    at alpha=0.05 (two-sided) / power=0.8 from the OBSERVED arm
    rates of ab_test_events: n per arm = (z_a+z_b)²·(p1q1+p2q2)/Δ²,
    with the standard-normal quantiles as hardcoded constants.  The
    planning step of the experimentation suite (design → test →
    variance-reduce is now power_analysis → ab_test/welch → cuped).

  * feature_ranking_docs — information-gain ranking of three
    deterministic candidate features (256-char length band, source
    prefix, doc_id parity) for the lang='en' label: one contingency
    aggregate per feature, H(Y)−H(Y|X) exactly as infogain_type_user,
    emitted as a ranked table.  The feature-selection sweep a tree
    trainer runs before splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# ams_f2_events
# ---------------------------------------------------------------------------

_AMS_ROWS = 5


def _ams_sign_sql(i: int) -> str:
    return (
        f"CASE WHEN CAST(('0x' || substr(md5('ams{i}#' || key), 1, 4)) AS INTEGER) % 2 = 0 "
        "THEN 1 ELSE -1 END"
    )


_AMS_SQL = f"""
    WITH keyed AS (
      SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS key FROM events
    ),
    sketch AS (
      SELECT {", ".join(f"SUM({_ams_sign_sql(i)}) AS s{i}" for i in range(_AMS_ROWS))}
      FROM keyed
    ),
    ests AS (
      {" UNION ALL ".join(f"SELECT CAST(s{i} AS BIGINT) * s{i} AS est FROM sketch" for i in range(_AMS_ROWS))}
    ),
    med AS (
      SELECT est FROM (
        SELECT est, row_number() OVER (ORDER BY est) AS rk FROM ests
      ) WHERE rk = {(_AMS_ROWS + 1) // 2}
    ),
    truth AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS f2
      FROM (SELECT COUNT(*) AS c FROM keyed GROUP BY key)
    )
    SELECT t.f2 AS exact_f2,
           m.est AS ams_estimate,
           ROUND(m.est * 1.0 / t.f2, 6) AS ratio
    FROM truth t, med m
"""


@register("ams_f2_events", _AMS_SQL)
def ams_f2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("event_type")).alias("key")
    )

    def sign(i: int):
        return F.when(
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"ams{i}#"), F.col("key"))), 1, 4), 16, 10
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            1,
        ).otherwise(-1)

    sketch = keyed.agg(*[F.sum(sign(i)).alias(f"s{i}") for i in range(_AMS_ROWS)])
    ests = sketch.select(
        F.explode(
            F.array(*[(F.col(f"s{i}").cast("long") * F.col(f"s{i}")).alias("e") for i in range(_AMS_ROWS)])
        ).alias("est")
    )
    from pyspark.sql import Window

    med = (
        ests.select("est", F.row_number().over(Window.orderBy("est")).alias("rk"))
        .filter(F.col("rk") == (_AMS_ROWS + 1) // 2)
        .select("est")
    )
    truth = (
        keyed.groupBy("key")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"))
    )
    return truth.crossJoin(med).select(
        F.col("f2").alias("exact_f2"),
        F.col("est").alias("ams_estimate"),
        F.round(F.col("est") * 1.0 / F.col("f2"), 6).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# power_analysis_events
# ---------------------------------------------------------------------------

_POWER_SQL = """
    WITH outcomes AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted
      FROM events
    ),
    rates AS (
      SELECT AVG(CASE WHEN arm = 'A' THEN converted * 1.0 END) AS p1,
             AVG(CASE WHEN arm = 'B' THEN converted * 1.0 END) AS p2
      FROM outcomes
    )
    SELECT ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
           ROUND(abs(p1 - p2), 6) AS effect,
           CAST(ceil(pow(1.959964 + 0.841621, 2)
                     * (p1 * (1 - p1) + p2 * (1 - p2))
                     / pow(p1 - p2, 2)) AS BIGINT) AS n_per_arm
    FROM rates
"""


@register("power_analysis_events", _POWER_SQL)
def power_analysis_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    outcomes = ev.select(
        F.when(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 0,
            "A",
        ).otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("converted"),
    )
    rates = outcomes.agg(
        F.avg(F.when(F.col("arm") == "A", F.col("converted") * 1.0)).alias("p1"),
        F.avg(F.when(F.col("arm") == "B", F.col("converted") * 1.0)).alias("p2"),
    )
    za_zb = 1.959964 + 0.841621
    return rates.select(
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round(F.abs(F.col("p1") - F.col("p2")), 6).alias("effect"),
        F.ceil(
            (za_zb ** 2)
            * (F.col("p1") * (1 - F.col("p1")) + F.col("p2") * (1 - F.col("p2")))
            / F.pow(F.col("p1") - F.col("p2"), 2)
        ).cast("long").alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# feature_ranking_docs
# ---------------------------------------------------------------------------

_FEATS = {
    "len_band": "CAST(floor(n_chars / 256.0) AS VARCHAR)",
    "source_prefix": "substr(source, 1, 4)",
    "id_parity": "CAST(doc_id % 2 AS VARCHAR)",
}

_FEATS_SPARK = {
    "len_band": "CAST(floor(n_chars / 256.0) AS STRING)",
    "source_prefix": "substr(source, 1, 4)",
    "id_parity": "CAST(doc_id % 2 AS STRING)",
}

_FRANK_TEMPLATE = """
    WITH labeled AS (
      SELECT {feats}, CAST(lang = 'en' AS INTEGER) AS y FROM documents
    ),
    hy AS (
      SELECT CASE WHEN AVG(CAST(y AS DOUBLE)) IN (0, 1) THEN 0.0
                  ELSE -AVG(CAST(y AS DOUBLE)) * log2(AVG(CAST(y AS DOUBLE)))
                       - (1 - AVG(CAST(y AS DOUBLE))) * log2(1 - AVG(CAST(y AS DOUBLE))) END AS h
      FROM labeled
    ),
    gains AS (
      {unions}
    )
    SELECT g.feature, g.n_values,
           ROUND((SELECT h FROM hy) - g.cond_h, 6) AS info_gain
    FROM gains g
"""

_GAIN_BLOCK = """
      SELECT '{name}' AS feature,
             COUNT(*) AS n_values,
             SUM(cnt * (CASE WHEN p IN (0, 1) THEN 0.0
                             ELSE -p * log2(p) - (1 - p) * log2(1 - p) END))
               / SUM(cnt) AS cond_h
      FROM (
        SELECT {expr} AS v, COUNT(*) AS cnt, AVG(CAST(y AS DOUBLE)) AS p
        FROM labeled GROUP BY 1
      )
"""


def _frank_sql(feats: dict) -> str:
    feat_cols = ", ".join(f"{e} AS f_{n}" for n, e in feats.items())
    unions = " UNION ALL ".join(
        _GAIN_BLOCK.format(name=n, expr=f"f_{n}") for n in feats
    )
    return _FRANK_TEMPLATE.format(feats=feat_cols, unions=unions)


@register("feature_ranking_docs", _frank_sql(_FEATS))
def feature_ranking_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_frank_sql(_FEATS_SPARK))
