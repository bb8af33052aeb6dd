"""Hundred-sixty-seventh oracle-registry module: survey calibration
and categorical effect size — reweighting a biased sample to known
margins, and measuring how strong a contingency association actually
is.

  * ipf_raking_events — iterative proportional fitting (raking) of
    the value<=50 subsample's (day × type) cell counts to the FULL
    population's day and type margins: three alternating
    row/column/row scalings, cell weights ROUNDED to 6 after each
    scaling so both engines walk the identical trajectory.  Reports
    per type the achieved column margin after 3 half-iterations vs
    its target — the calibration-weighting step every
    post-stratified readout (poststrat_ab_events) generalizes to
    when TWO margins must hold at once and the joint distribution
    is unknown.

  * cramers_v_events — effect size for the day-of-week × event-type
    contingency table: chi-square from expected counts, Cramér's V,
    Tschuprow's T, and the Bergsma bias-corrected V (phi2 shrunk by
    (r-1)(c-1)/(n-1), dimensions shrunk likewise) — the correction
    that keeps large-n tiny-effect tables from reading as
    "association found".  Completes chi2_type_user, which tests
    significance but not magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_IPF_SQL = """
    WITH pop AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type AS t
      FROM events
    ),
    rtar AS (SELECT d, CAST(COUNT(*) AS DOUBLE) AS r FROM pop GROUP BY d),
    ctar AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS c FROM pop GROUP BY t),
    cells AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type AS t,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM events WHERE value <= 50
      GROUP BY 1, 2
    ),
    w1 AS (
      SELECT c.d, c.t,
             ROUND(c.w * r.r / SUM(c.w) OVER (PARTITION BY c.d), 6) AS w
      FROM cells c JOIN rtar r ON r.d = c.d
    ),
    w2 AS (
      SELECT w1.d, w1.t,
             ROUND(w1.w * ct.c / SUM(w1.w) OVER (PARTITION BY w1.t), 6)
               AS w
      FROM w1 JOIN ctar ct ON ct.t = w1.t
    ),
    w3 AS (
      SELECT w2.d, w2.t,
             ROUND(w2.w * r.r / SUM(w2.w) OVER (PARTITION BY w2.d), 6) AS w
      FROM w2 JOIN rtar r ON r.d = w2.d
    )
    SELECT w3.t AS event_type,
           ROUND(MAX(ct.c), 1) AS target,
           ROUND(SUM(w3.w), 3) AS achieved,
           ROUND((SUM(w3.w) - MAX(ct.c)) / MAX(ct.c), 6) AS rel_gap
    FROM w3 JOIN ctar ct ON ct.t = w3.t
    GROUP BY w3.t
    ORDER BY event_type
"""


@register("ipf_raking_events", _IPF_SQL)
def ipf_raking_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    pop = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.col("event_type").alias("t"),
    )
    rtar = pop.groupBy("d").agg(F.count("*").cast("double").alias("r"))
    ctar = pop.groupBy("t").agg(F.count("*").cast("double").alias("c"))
    cells = (
        ev.where(F.col("value") <= 50)
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("d"),
            F.col("event_type").alias("t"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    wd = Window.partitionBy("d")
    wt = Window.partitionBy("t")
    w1 = cells.join(F.broadcast(rtar), "d").select(
        "d",
        "t",
        F.round(F.col("w") * F.col("r") / F.sum("w").over(wd), 6).alias("w"),
    )
    w2 = w1.join(F.broadcast(ctar), "t").select(
        "d",
        "t",
        F.round(F.col("w") * F.col("c") / F.sum("w").over(wt), 6).alias("w"),
    )
    w3 = w2.join(F.broadcast(rtar), "d").select(
        "d",
        "t",
        F.round(F.col("w") * F.col("r") / F.sum("w").over(wd), 6).alias("w"),
    )
    return (
        w3.join(F.broadcast(ctar), "t")
        .groupBy("t")
        .agg(
            F.round(F.max("c"), 1).alias("target"),
            F.round(F.sum("w"), 3).alias("achieved"),
            F.round((F.sum("w") - F.max("c")) / F.max("c"), 6).alias(
                "rel_gap"
            ),
        )
        .select(F.col("t").alias("event_type"), "target", "achieved", "rel_gap")
        .orderBy("event_type")
    )


_CRAMER_SQL = """
    WITH obs AS (
      SELECT dayofweek(ts) AS dw, event_type AS t, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    marg AS (
      SELECT o.dw, o.t, o.o,
             SUM(o.o) OVER (PARTITION BY o.dw) AS rm,
             SUM(o.o) OVER (PARTITION BY o.t) AS cm,
             SUM(o.o) OVER () AS n
      FROM obs o
    ),
    chi AS (
      SELECT MAX(n) AS n,
             COUNT(DISTINCT dw) AS r, COUNT(DISTINCT t) AS c,
             SUM((o - CAST(rm AS DOUBLE) * cm / n)
                 * (o - CAST(rm AS DOUBLE) * cm / n)
                 / (CAST(rm AS DOUBLE) * cm / n)) AS chi2
      FROM marg
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
           CAST(c AS BIGINT) AS c,
           ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n * (LEAST(r, c) - 1))), 6) AS cramers_v,
           ROUND(SQRT(chi2 / (n * SQRT(CAST((r - 1) * (c - 1) AS DOUBLE)))), 6)
             AS tschuprow_t,
           ROUND(SQRT(
             GREATEST(0, chi2 / n - CAST((r - 1) * (c - 1) AS DOUBLE) / (n - 1))
             / LEAST(r - CAST((r - 1) * (r - 1) AS DOUBLE) / (n - 1),
                     c - CAST((c - 1) * (c - 1) AS DOUBLE) / (n - 1))
           ), 6) AS cramers_v_corrected
    FROM chi
"""


@register("cramers_v_events", _CRAMER_SQL)
def cramers_v_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.dayofweek("ts").alias("dw"), F.col("event_type").alias("t")
    ).agg(F.count("*").alias("o"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    marg = obs.select(
        "dw",
        "t",
        "o",
        F.sum("o").over(Window.partitionBy("dw")).alias("rm"),
        F.sum("o").over(Window.partitionBy("t")).alias("cm"),
        F.sum("o").over(wall).alias("n"),
    )
    e = F.col("rm").cast("double") * F.col("cm") / F.col("n")
    chi = marg.agg(
        F.max("n").alias("n"),
        F.countDistinct("dw").alias("r"),
        F.countDistinct("t").alias("c"),
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
    )
    r1c1 = ((F.col("r") - 1) * (F.col("c") - 1)).cast("double")
    phi2c = F.greatest(
        F.lit(0.0), F.col("chi2") / F.col("n") - r1c1 / (F.col("n") - 1)
    )
    rc_corr = F.least(
        F.col("r")
        - ((F.col("r") - 1) * (F.col("r") - 1)).cast("double")
        / (F.col("n") - 1),
        F.col("c")
        - ((F.col("c") - 1) * (F.col("c") - 1)).cast("double")
        / (F.col("n") - 1),
    )
    return chi.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 6
        ).alias("cramers_v"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.sqrt(r1c1))), 6
        ).alias("tschuprow_t"),
        F.round(F.sqrt(phi2c / rc_corr), 6).alias("cramers_v_corrected"),
    )
