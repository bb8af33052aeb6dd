"""Two-hundred-eighth oracle-registry module: probabilistic-forecast
calibration beyond binning — the exact-moment Z test and the PIT
uniformity audit (sharing oracle_defs173's Abramowitz-Stegun normal
CDF on both engines).

  * spiegelhalter_z_events — Spiegelhalter's calibration Z on the
    (forecast p = props.k / 100, outcome = value > 50) pairs:
    Z = sum (x - p)(1 - 2p) / sqrt(sum (1 - 2p)^2 p (1 - p)).
    Unlike Hosmer-Lemeshow / ECE it needs NO binning choice — it
    tests exact mean calibration with the Brier score's own
    decomposition, immune to the bin-boundary gaming that plagues
    binned calibration audits.

  * pit_histogram_events — probability integral transform check of
    a Gaussian per-type forecaster: fit (mu, sd) per event type on
    the FIRST half of the month, PIT = Phi((x - mu)/sd) for
    second-half values, 10 equal PIT bins with counts and the
    chi-square uniformity statistic.  U-shaped → forecaster
    overconfident (sd too small), hump-shaped → underconfident —
    the standard verification plot for distributional forecasts,
    reduced to one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracle_defs173 import _PHI_SQL, _phi_col
from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SPIEGEL_SQL = """
    WITH obs AS (
      SELECT CAST(json_extract(props, '$.k') AS DOUBLE) / 100 AS p,
             CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END AS x
      FROM events
    ),
    ok AS (SELECT * FROM obs WHERE p > 0 AND p < 1),
    agg AS (
      SELECT COUNT(*) AS n,
             SUM((x - p) * (1 - 2 * p)) AS num,
             SUM((1 - 2 * p) * (1 - 2 * p) * p * (1 - p)) AS den,
             AVG(POW(x - p, 2)) AS brier,
             AVG(x) AS base_rate, AVG(p) AS mean_forecast
      FROM ok
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(num / SQRT(den), 6) AS spiegelhalter_z,
           ROUND(brier, 6) AS brier,
           ROUND(base_rate, 6) AS base_rate,
           ROUND(mean_forecast, 6) AS mean_forecast
    FROM agg
"""


@register("spiegelhalter_z_events", _SPIEGEL_SQL)
def spiegelhalter_z_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        (F.get_json_object("props", "$.k").cast("double") / 100).alias("p"),
        F.when(F.col("value") > 50, 1.0).otherwise(0.0).alias("x"),
    ).where((F.col("p") > 0) & (F.col("p") < 1))
    agg = obs.agg(
        F.count("*").alias("n"),
        F.sum((F.col("x") - F.col("p")) * (1 - 2 * F.col("p"))).alias("num"),
        F.sum(
            (1 - 2 * F.col("p"))
            * (1 - 2 * F.col("p"))
            * F.col("p")
            * (1 - F.col("p"))
        ).alias("den"),
        F.avg(F.pow(F.col("x") - F.col("p"), 2)).alias("brier"),
        F.avg("x").alias("base_rate"),
        F.avg("p").alias("mean_forecast"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("num") / F.sqrt(F.col("den")), 6).alias(
            "spiegelhalter_z"
        ),
        F.round("brier", 6).alias("brier"),
        F.round("base_rate", 6).alias("base_rate"),
        F.round("mean_forecast", 6).alias("mean_forecast"),
    )


_PIT_SQL = f"""
    WITH train AS (
      SELECT event_type, AVG(value) AS mu,
             SQRT((SUM(value * value) - COUNT(*) * AVG(value) * AVG(value))
                  / (COUNT(*) - 1)) AS sd
      FROM events WHERE EXTRACT(day FROM ts) <= 15
      GROUP BY event_type
    ),
    test AS (
      SELECT e.event_type,
             ROUND((e.value - t.mu) / t.sd, 6) AS z
      FROM events e JOIN train t ON t.event_type = e.event_type
      WHERE EXTRACT(day FROM ts) > 15
    ),
    pit AS (
      SELECT LEAST(CAST(FLOOR({_PHI_SQL.format(z='z')} * 10) AS INTEGER), 9)
               AS b
      FROM test
    ),
    hist AS (
      SELECT b, COUNT(*) AS c FROM pit GROUP BY b
    ),
    n AS (SELECT SUM(c) AS n FROM hist)
    SELECT b AS pit_bin, CAST(c AS BIGINT) AS n_obs,
           ROUND(CAST(c AS DOUBLE) / (SELECT n FROM n), 6) AS share,
           ROUND(SUM(POW(c - (SELECT n FROM n) / 10.0, 2)
                     / ((SELECT n FROM n) / 10.0)) OVER (), 6)
             AS chi2_uniformity
    FROM hist
    ORDER BY pit_bin
"""


@register("pit_histogram_events", _PIT_SQL)
def pit_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    train = (
        ev.where(F.dayofmonth("ts") <= 15)
        .groupBy("event_type")
        .agg(
            F.avg("value").alias("mu"),
            F.sqrt(
                (
                    F.sum(F.col("value") * F.col("value"))
                    - F.count("*") * F.avg("value") * F.avg("value")
                )
                / (F.count("*") - 1)
            ).alias("sd"),
        )
    )
    test = (
        ev.where(F.dayofmonth("ts") > 15)
        .join(F.broadcast(train), "event_type")
        .select(
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6).alias(
                "z"
            )
        )
    )
    pit = test.select(
        F.least(
            F.floor(_phi_col(F.col("z")) * 10).cast("int"), F.lit(9)
        ).alias("b")
    )
    hist = pit.groupBy("b").agg(F.count("*").alias("c"))
    n = hist.agg(F.sum("c").alias("n"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        hist.crossJoin(F.broadcast(n))
        .select(
            F.col("b").alias("pit_bin"),
            F.col("c").cast("long").alias("n_obs"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias("share"),
            F.round(
                F.sum(
                    F.pow(F.col("c") - F.col("n") / 10.0, 2)
                    / (F.col("n") / 10.0)
                ).over(wall),
                6,
            ).alias("chi2_uniformity"),
        )
        .orderBy("pit_bin")
    )
