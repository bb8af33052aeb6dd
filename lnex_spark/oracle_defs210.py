"""Two-hundred-tenth oracle-registry module: robust anomaly
machinery — iterative outlier peeling and the bucketed-mean
estimator with exponential concentration.

  * esd_outliers_events — simplified seasonal-ESD: deseasonalize
    the daily mean series by removing day-of-week means, then THREE
    unrolled generalized-ESD rounds, each computing the max
    |residual - mean|/sd point, flagging it if z > 2.5, and
    removing it before the next round (the re-computation after
    each removal is the point — a single z-pass lets one huge
    outlier mask its neighbors by inflating sd).  Emits one row per
    round with the candidate day, its z, and the flag.

  * median_of_means_events — median-of-means estimate of the mean
    value: k = 16 deterministic md5 buckets over event_id, bucket
    means, median of the 16 by explicit rank pick, next to the
    plain mean and the trimmed mean (drop 2 extreme buckets per
    side).  MoM concentrates exponentially even with only finite
    variance — the estimator of choice when heavy tails make the
    sample mean itself an outlier; bucket hashing is exactly how it
    distributes (map-side partial means, driver-side median).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_ROUNDS = 3
_ZCRIT = 2.5


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _esd_sql() -> str:
    blocks = [
        """daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             dayofweek(ts) AS dw,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1, 2
    ),
    dow AS (SELECT dw, AVG(y) AS m FROM daily GROUP BY dw),
    r0 AS (
      SELECT da.d, ROUND(da.y - dow.m, 6) AS r
      FROM daily da JOIN dow ON dow.dw = da.dw
    )"""
    ]
    rows = []
    for k in range(1, _ROUNDS + 1):
        p = k - 1
        blocks.append(
            f"""m{k} AS (
      SELECT AVG(r) AS mu,
             SQRT((SUM(r * r) - COUNT(*) * AVG(r) * AVG(r))
                  / (COUNT(*) - 1)) AS sd
      FROM r{p}
    ),
    top{k} AS (
      SELECT r.d, r.r, ABS(r.r - m.mu) / m.sd AS z
      FROM r{p} r CROSS JOIN m{k} m
      ORDER BY ABS(r.r - m.mu) / m.sd DESC, r.d
      LIMIT 1
    ),
    r{k} AS (
      SELECT d, r FROM r{p}
      WHERE d <> (SELECT d FROM top{k})
    )"""
        )
        rows.append(
            f"SELECT {k} AS round, d AS day, ROUND(z, 4) AS z,"
            f" CASE WHEN z > {_ZCRIT!r} THEN 1 ELSE 0 END AS flagged"
            f" FROM top{k}"
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + "\n    SELECT * FROM ("
        + "\n    UNION ALL ".join(rows)
        + ") ORDER BY round"
    )


@register("esd_outliers_events", _esd_sql())
def esd_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.dayofweek("ts").alias("dw"),
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    dow = daily.groupBy("dw").agg(F.avg("y").alias("m"))
    r = daily.join(F.broadcast(dow), "dw").select(
        "d", F.round(F.col("y") - F.col("m"), 6).alias("r")
    )
    outs = []
    for k in range(1, _ROUNDS + 1):
        m = r.agg(
            F.avg("r").alias("mu"),
            F.sqrt(
                (
                    F.sum(F.col("r") * F.col("r"))
                    - F.count("*") * F.avg("r") * F.avg("r")
                )
                / (F.count("*") - 1)
            ).alias("sd"),
        )
        top = (
            r.crossJoin(F.broadcast(m))
            .select(
                "d",
                "r",
                (F.abs(F.col("r") - F.col("mu")) / F.col("sd")).alias("z"),
            )
            .orderBy(F.desc("z"), "d")
            .limit(1)
        )
        outs.append(
            top.select(
                F.lit(k).alias("round"),
                F.col("d").alias("day"),
                F.round("z", 4).alias("z"),
                F.when(F.col("z") > _ZCRIT, 1).otherwise(0).alias("flagged"),
            )
        )
        drop = top.select(F.col("d").alias("dd"))
        r = r.join(F.broadcast(drop), F.col("d") == F.col("dd"), "left_anti")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("round")


_MOM_SQL = """
    WITH bucketed AS (
      SELECT value,
             CAST(('0x' || substr(md5('mom#' || CAST(event_id AS VARCHAR)),
                   1, 4)) AS INTEGER) % 16 AS b
      FROM events
    ),
    bmeans AS (
      SELECT b, AVG(value) AS m, COUNT(*) AS n FROM bucketed GROUP BY b
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn,
             COUNT(*) OVER () AS k
      FROM bmeans
    ),
    mom AS (
      SELECT MAX(CASE WHEN rn = CAST(CEIL(k / 2.0) AS BIGINT)
                      THEN m END) AS median_of_means,
             AVG(CASE WHEN rn > 2 AND rn <= k - 2 THEN m END)
               AS trimmed_mean_of_means,
             MAX(k) AS k
      FROM ranked
    ),
    plain AS (SELECT AVG(value) AS mean FROM events)
    SELECT CAST(m.k AS BIGINT) AS n_buckets,
           ROUND((SELECT mean FROM plain), 6) AS plain_mean,
           ROUND(m.median_of_means, 6) AS median_of_means,
           ROUND(m.trimmed_mean_of_means, 6) AS trimmed_mean,
           ROUND(ABS(m.median_of_means - (SELECT mean FROM plain)), 6)
             AS mom_gap
    FROM mom m
"""


@register("median_of_means_events", _MOM_SQL)
def median_of_means_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucketed = ev.select(
        "value",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mom#"), F.col("event_id").cast("string")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 16
        ).alias("b"),
    )
    bmeans = bucketed.groupBy("b").agg(
        F.avg("value").alias("m"), F.count("*").alias("n")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = bmeans.select(
        "m",
        F.row_number().over(Window.orderBy("m", "b")).alias("rn"),
        F.count("*").over(wall).alias("k"),
    )
    mom = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("k") / 2.0).cast("long"),
                F.col("m"),
            )
        ).alias("median_of_means"),
        F.avg(
            F.when(
                (F.col("rn") > 2) & (F.col("rn") <= F.col("k") - 2),
                F.col("m"),
            )
        ).alias("trimmed_mean_of_means"),
        F.max("k").alias("k"),
    )
    plain = ev.agg(F.avg("value").alias("mean"))
    return mom.crossJoin(F.broadcast(plain)).select(
        F.col("k").cast("long").alias("n_buckets"),
        F.round("mean", 6).alias("plain_mean"),
        F.round("median_of_means", 6).alias("median_of_means"),
        F.round("trimmed_mean_of_means", 6).alias("trimmed_mean"),
        F.round(
            F.abs(F.col("median_of_means") - F.col("mean")), 6
        ).alias("mom_gap"),
    )
