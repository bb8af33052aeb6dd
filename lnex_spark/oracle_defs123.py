"""Hundred-twenty-third oracle-registry module: calibration testing
and effect decay.

  * hosmer_lemeshow_docs — the Hosmer-Lemeshow goodness-of-fit
    chi-square over the same decile reliability bins as
    calibration_bins_docs: HL = Σ (O−E)²/(E·(1−p̄)) across bins,
    with the 15.507 (df=8, 5%) flag.  ECE/Brier summarize
    miscalibration; HL TESTS it — the formal verdict on whether the
    deterministic logistic quality score's probabilities can be
    taken literally.

  * effect_decay_events — novelty-effect detection: the md5-arm
    value contrast estimated separately per week of the timeline,
    plus the least-squares slope of effect-on-week.  Launch effects
    that decay week over week are novelty, not product value — the
    readout that stops a team from shipping a vanishing win; one
    aggregation per week and a 4-point closed-form slope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_HL_SQL = """
    WITH scored AS (
      SELECT 1.0 / (1.0 + exp(-(n_chars - 400) / 150.0)) AS p,
             CAST(lang = 'en' AS INTEGER) AS y
      FROM documents
    ),
    binned AS (
      SELECT LEAST(9, CAST(floor(p * 10) AS INTEGER)) AS bin, p, y FROM scored
    ),
    cells AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS o, AVG(p) AS pbar
      FROM binned GROUP BY bin
    ),
    hl AS (
      SELECT COUNT(*) AS n_bins,
             SUM(pow(o - n * pbar, 2) / (n * pbar * (1.0 - pbar))) AS hl_chi2
      FROM cells WHERE pbar > 0 AND pbar < 1
    )
    SELECT CAST(n_bins AS BIGINT) AS n_bins,
           ROUND(hl_chi2, 6) AS hl_chi2,
           CAST(hl_chi2 > 15.507 AS INTEGER) AS miscalibrated
    FROM hl
"""


@register("hosmer_lemeshow_docs", _HL_SQL)
def hosmer_lemeshow_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (1.0 / (1.0 + F.exp(-(F.col("n_chars") - 400) / 150.0))).alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    binned = scored.select(
        F.least(F.lit(9), F.floor(F.col("p") * 10).cast("int")).alias("bin"),
        "p",
        "y",
    )
    cells = binned.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("y").alias("o"), F.avg("p").alias("pbar")
    )
    hl = cells.filter((F.col("pbar") > 0) & (F.col("pbar") < 1)).agg(
        F.count("*").alias("n_bins"),
        F.sum(
            F.pow(F.col("o") - F.col("n") * F.col("pbar"), 2)
            / (F.col("n") * F.col("pbar") * (1.0 - F.col("pbar")))
        ).alias("hl_chi2"),
    )
    return hl.select(
        F.col("n_bins").cast("long").alias("n_bins"),
        F.round("hl_chi2", 6).alias("hl_chi2"),
        (F.col("hl_chi2") > 15.507).cast("int").alias("miscalibrated"),
    )


_DECAY_SQL = """
    WITH base AS (
      SELECT value,
             CAST(datediff('day', DATE '2024-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) // 7 AS INTEGER) AS wk,
             CASE WHEN CAST(('0x' || substr(md5('ab-v1#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS arm
      FROM events
      WHERE datediff('day', DATE '2024-01-01',
                     CAST(date_trunc('day', ts) AS DATE)) < 28
    ),
    weekly AS (
      SELECT wk,
             AVG(CASE WHEN arm = 1 THEN value END)
               - AVG(CASE WHEN arm = 0 THEN value END) AS eff,
             COUNT(*) AS n
      FROM base GROUP BY wk
    ),
    fit AS (
      SELECT (AVG(wk * eff) - AVG(wk * 1.0) * AVG(eff))
               / (AVG(wk * wk * 1.0) - AVG(wk * 1.0) * AVG(wk * 1.0)) AS slope
      FROM weekly
    )
    SELECT w.wk, CAST(w.n AS BIGINT) AS n_events,
           ROUND(w.eff, 6) AS weekly_effect,
           ROUND(f.slope, 6) AS decay_slope
    FROM weekly w CROSS JOIN fit f
"""


@register("effect_decay_events", _DECAY_SQL)
def effect_decay_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dnum = F.datediff(
        F.to_date(F.date_trunc("day", F.col("ts"))),
        F.lit("2024-01-01").cast("date"),
    )
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1#"), F.col("event_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        1,
    ).otherwise(0)
    base = ev.filter(dnum < 28).select(
        "value", F.floor(dnum / 7).cast("int").alias("wk"), arm.alias("arm")
    )
    weekly = base.groupBy("wk").agg(
        (
            F.avg(F.when(F.col("arm") == 1, F.col("value")))
            - F.avg(F.when(F.col("arm") == 0, F.col("value")))
        ).alias("eff"),
        F.count("*").alias("n"),
    )
    fit = weekly.agg(
        (
            (F.avg(F.col("wk") * F.col("eff")) - F.avg(F.col("wk") * 1.0) * F.avg("eff"))
            / (
                F.avg(F.col("wk") * F.col("wk") * 1.0)
                - F.avg(F.col("wk") * 1.0) * F.avg(F.col("wk") * 1.0)
            )
        ).alias("slope")
    )
    return weekly.crossJoin(fit).select(
        "wk",
        F.col("n").cast("long").alias("n_events"),
        F.round("eff", 6).alias("weekly_effect"),
        F.round("slope", 6).alias("decay_slope"),
    )
