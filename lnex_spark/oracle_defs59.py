"""Fifty-ninth oracle-registry module: survival-curve comparison and
privacy auditing.

  * logrank_events — the log-rank test comparing the survival of
    'click' vs 'error' (user, type) activity episodes (the same
    episode construction as kaplan_meier_episodes): at every event
    duration, observed vs expected group-A deaths under the pooled
    hazard, chi-square statistic from the hypergeometric variance.
    All windows over the distinct-duration table; the standard
    two-curve comparison a KM plot is read with.

  * k_anonymity_docs — the k-anonymity / l-diversity audit over the
    (lang, 128-char length band) quasi-identifier: per equivalence
    class its size and the number of distinct sensitive values
    (source), plus corpus-level minimum k, the number of rows in
    classes violating k=5, and minimum l.  The privacy gate that
    runs before a corpus release — one hash aggregate over the QI,
    one tiny rollup; pairs with pii_scrub_docs (redaction) and
    dp_noisy_counts_events (noisy release) into a privacy suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DAY_US = 86_400_000_000

_LOGRANK_SQL = f"""
    WITH lives AS (
      SELECT user_id, event_type,
             CAST(floor((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / {_DAY_US}.0) AS BIGINT) AS dur,
             epoch_us(MAX(ts)) AS last_us
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY user_id, event_type
    ),
    horizon AS (
      SELECT user_id, MAX(epoch_us(ts)) AS u_last FROM events GROUP BY user_id
    ),
    labeled AS (
      SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS grp, dur,
             CASE WHEN last_us < u_last - 2 * {_DAY_US} THEN 1 ELSE 0 END AS ev
      FROM lives JOIN horizon USING (user_id)
    ),
    per_dur AS (
      SELECT dur,
             SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS d_a,
             SUM(ev) AS d_tot,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS leave_a,
             COUNT(*) AS leave_tot
      FROM labeled GROUP BY dur
    ),
    risked AS (
      SELECT dur, d_a, d_tot,
             (SELECT COUNT(*) FROM labeled WHERE grp = 0)
               - COALESCE(SUM(leave_a) OVER w, 0) AS n_a,
             (SELECT COUNT(*) FROM labeled)
               - COALESCE(SUM(leave_tot) OVER w, 0) AS n_tot
      FROM per_dur
      WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    terms AS (
      SELECT d_a,
             d_tot * (n_a * 1.0 / n_tot) AS e_a,
             CASE WHEN n_tot > 1
                  THEN d_tot * (n_a * 1.0 / n_tot) * (1 - n_a * 1.0 / n_tot)
                       * (n_tot - d_tot) / (n_tot - 1.0)
                  ELSE 0.0 END AS v_a
      FROM risked WHERE d_tot > 0
    )
    SELECT CAST(SUM(d_a) AS BIGINT) AS observed_a,
           ROUND(SUM(e_a), 6) AS expected_a,
           ROUND(pow(SUM(d_a) - SUM(e_a), 2) / SUM(v_a), 6) AS chi2
    FROM terms
"""


@register("logrank_events", _LOGRANK_SQL)
def logrank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    lives = (
        ev.filter(F.col("event_type").isin("click", "error"))
        .groupBy("user_id", "event_type")
        .agg(
            F.floor(
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / float(_DAY_US)
            ).cast("long").alias("dur"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("last_us"),
        )
    )
    horizon = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("u_last")
    )
    labeled = lives.join(horizon, "user_id").select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("grp"),
        "dur",
        F.when(F.col("last_us") < F.col("u_last") - 2 * _DAY_US, 1).otherwise(0).alias("ev"),
    )
    totals = labeled.agg(
        F.count("*").alias("nt"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("na0"),
    )
    per_dur = labeled.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ev")).otherwise(0)).alias("d_a"),
        F.sum("ev").alias("d_tot"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("leave_a"),
        F.count("*").alias("leave_tot"),
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risked = per_dur.crossJoin(totals).select(
        "dur",
        "d_a",
        "d_tot",
        (F.col("na0") - F.coalesce(F.sum("leave_a").over(wprev), F.lit(0))).alias("n_a"),
        (F.col("nt") - F.coalesce(F.sum("leave_tot").over(wprev), F.lit(0))).alias("n_tot"),
    )
    share = F.col("n_a") * 1.0 / F.col("n_tot")
    terms = risked.filter(F.col("d_tot") > 0).select(
        "d_a",
        (F.col("d_tot") * share).alias("e_a"),
        F.when(
            F.col("n_tot") > 1,
            F.col("d_tot") * share * (1 - share) * (F.col("n_tot") - F.col("d_tot"))
            / (F.col("n_tot") - 1.0),
        ).otherwise(0.0).alias("v_a"),
    )
    return terms.agg(
        F.sum("d_a").cast("long").alias("observed_a"),
        F.round(F.sum("e_a"), 6).alias("expected_a"),
        F.round(F.pow(F.sum("d_a") - F.sum("e_a"), 2) / F.sum("v_a"), 6).alias("chi2"),
    )


_KANON_SQL = """
    WITH qi AS (
      SELECT lang,
             CAST(floor(n_chars / 128.0) AS BIGINT) AS len_band,
             source
      FROM documents
    ),
    classes AS (
      SELECT lang, len_band,
             COUNT(*) AS class_size,
             COUNT(DISTINCT source) AS l_div
      FROM qi GROUP BY lang, len_band
    )
    SELECT COUNT(*) AS n_classes,
           MIN(class_size) AS min_k,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_violating_k5,
           MIN(l_div) AS min_l,
           CAST(SUM(class_size) AS BIGINT) AS n_rows
    FROM classes
"""


@register("k_anonymity_docs", _KANON_SQL)
def k_anonymity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    qi = d.select(
        "lang",
        F.floor(F.col("n_chars") / 128.0).cast("long").alias("len_band"),
        "source",
    )
    classes = qi.groupBy("lang", "len_band").agg(
        F.count("*").alias("class_size"),
        F.countDistinct("source").alias("l_div"),
    )
    return classes.agg(
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("min_k"),
        F.sum(F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_violating_k5"),
        F.min("l_div").alias("min_l"),
        F.sum("class_size").cast("long").alias("n_rows"),
    )
