"""Hundred-twenty-first oracle-registry module: missingness-mechanism
testing and record statistics.

  * mcar_check_events — the missing-completely-at-random audit,
    demonstrated on two injected missingness patterns: an MCAR
    pattern (md5 coin only) and an MAR pattern (three times likelier
    to be missing on 'error' events).  For each pattern, the
    chi-square statistic of missingness against event_type — the
    MCAR pattern must sit near its degrees of freedom while the MAR
    pattern blows past the 9.488 (df=4, 5%) threshold, and the
    emitted flags prove the test separates them.  Whether
    imputation/deletion is even admissible rests on exactly this
    test.

  * records_test_events — the records test for trend: the number of
    running-maximum days in the daily count series vs the i.i.d.
    expectation H_n (the harmonic number — each position k is a
    record with probability 1/k under exchangeability).  An excess
    of records is a distribution-free trend signal; with
    Durbin-Watson (serial correlation), Hurst (long memory), and
    the variance ratio (mean reversion), it completes the
    assumption-audit kit for daily aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MCAR_SQL = """
    WITH base AS (
      SELECT event_type,
             CAST(('0x' || substr(md5('miss-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 100 AS coin
      FROM events
    ),
    patterns AS (
      SELECT 'mcar_coin' AS pattern, event_type,
             CASE WHEN coin < 20 THEN 1 ELSE 0 END AS missing
      FROM base
      UNION ALL
      SELECT 'mar_error_biased', event_type,
             CASE WHEN coin < (CASE WHEN event_type = 'error' THEN 45 ELSE 15 END)
                  THEN 1 ELSE 0 END
      FROM base
    ),
    cells AS (
      SELECT pattern, event_type,
             COUNT(*) AS n, SUM(missing) AS m
      FROM patterns GROUP BY pattern, event_type
    ),
    tots AS (
      SELECT pattern, SUM(n) AS n_all, SUM(m) AS m_all FROM cells GROUP BY pattern
    ),
    chi AS (
      SELECT c.pattern,
             SUM(pow(c.m - c.n * t.m_all * 1.0 / t.n_all, 2)
                 / (c.n * t.m_all * 1.0 / t.n_all * (1.0 - t.m_all * 1.0 / t.n_all)))
               AS chi2
      FROM cells c JOIN tots t ON c.pattern = t.pattern
      GROUP BY c.pattern
    )
    SELECT pattern, ROUND(chi2, 6) AS chi2,
           CAST(chi2 > 9.488 AS INTEGER) AS mar_flag
    FROM chi
"""


@register("mcar_check_events", _MCAR_SQL)
def mcar_check_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    coin = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("miss-v1#"), F.col("event_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    base = ev.select("event_type", coin.alias("coin"))
    mcar = base.select(
        F.lit("mcar_coin").alias("pattern"),
        "event_type",
        F.when(F.col("coin") < 20, 1).otherwise(0).alias("missing"),
    )
    mar = base.select(
        F.lit("mar_error_biased").alias("pattern"),
        "event_type",
        F.when(
            F.col("coin")
            < F.when(F.col("event_type") == "error", 45).otherwise(15),
            1,
        )
        .otherwise(0)
        .alias("missing"),
    )
    cells = (
        mcar.unionByName(mar)
        .groupBy("pattern", "event_type")
        .agg(F.count("*").alias("n"), F.sum("missing").alias("m"))
    )
    tots = cells.groupBy("pattern").agg(
        F.sum("n").alias("n_all"), F.sum("m").alias("m_all")
    )
    rate = F.col("m_all") * 1.0 / F.col("n_all")
    exp_m = F.col("n") * rate
    chi = (
        cells.join(tots, "pattern")
        .groupBy("pattern")
        .agg(
            F.sum(
                F.pow(F.col("m") - exp_m, 2) / (exp_m * (1.0 - rate))
            ).alias("chi2")
        )
    )
    return chi.select(
        "pattern",
        F.round("chi2", 6).alias("chi2"),
        (F.col("chi2") > 9.488).cast("int").alias("mar_flag"),
    )


_REC_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    runs AS (
      SELECT day, y,
             MAX(y) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
             row_number() OVER (ORDER BY day) AS k
      FROM daily
    ),
    records AS (
      SELECT k, CASE WHEN prev_max IS NULL OR y > prev_max THEN 1 ELSE 0 END AS rec
      FROM runs
    ),
    harm AS (
      SELECT SUM(1.0 / k) AS h_n, COUNT(*) AS n FROM records
    )
    SELECT CAST(h.n AS BIGINT) AS n_days,
           CAST((SELECT SUM(rec) FROM records) AS BIGINT) AS n_records,
           ROUND(h.h_n, 6) AS expected_records,
           ROUND((SELECT SUM(rec) FROM records) - h.h_n, 6) AS excess_records
    FROM harm h
"""


@register("records_test_events", _REC_SQL)
def records_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.count("*").alias("y")
    )
    # ~30-row calendar-bounded global window
    w = Window.orderBy("day")
    runs = daily.select(
        "y",
        F.max("y").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias(
            "prev_max"
        ),
        F.row_number().over(w).alias("k"),
    )
    records = runs.select(
        "k",
        F.when(
            F.col("prev_max").isNull() | (F.col("y") > F.col("prev_max")), 1
        )
        .otherwise(0)
        .alias("rec"),
    )
    return records.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("rec").cast("long").alias("n_records"),
        F.round(F.sum(1.0 / F.col("k")), 6).alias("expected_records"),
        F.round(F.sum("rec") - F.sum(1.0 / F.col("k")), 6).alias("excess_records"),
    )
