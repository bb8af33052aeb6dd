"""Seventy-eighth oracle-registry module: sequential drift detection
and multiple-testing control.

  * cusum_events — one-sided CUSUM over each event type's daily-mean
    series: baseline mu/sd from the first half-month, slack k =
    0.5*sd, decision threshold h = 4*sd.  The sequential recursion
    S_t = max(0, S_{t-1} + (x_t - mu - k)) is rewritten in closed
    form S_t = c_t - min(0, min_{j<=t} c_j) over the prefix sums
    c_t of the adjusted series — two keyed windows, no sequential
    loop (the same recursion-to-prefix-sum rewrite as ewma_values).
    CUSUM raises the alarm a localized changepoint op can then
    pin down; the sequential sibling of changepoint_events and
    hoeffding_seq_events.  Daily means are rounded to 6 digits
    BEFORE the cumulative pass so both engines fold identical
    summands.

  * bh_fdr_events — the multiple-comparisons discipline over a
    family of per-type A/B tests: each event type gets its own
    deterministic permutation test (md5 arms, B=16 md5-salted
    relabelings, p = (1+#{perm >= obs})/(1+B) — exact multiples of
    1/17, so cross-engine ranking is exact), then Benjamini-
    Hochberg step-up control at q = 0.25: sort p ascending, reject
    every rank up to the largest i with p_(i) <= q*i/m.  Running m
    tests and reporting the raw per-test verdicts is how pipelines
    ship false "significant segment" alerts; this is the correction
    that caps the expected false-discovery rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CUSUM_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ROUND(AVG(value), 6) AS dm
      FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    train AS (
      SELECT event_type, AVG(dm) AS mu0,
             sqrt(AVG(dm * dm) - AVG(dm) * AVG(dm)) AS sd
      FROM daily WHERE day < DATE '2024-01-16' GROUP BY event_type
    ),
    adj AS (
      SELECT d.event_type, d.day,
             d.dm - t.mu0 - 0.5 * t.sd AS a,
             4.0 * t.sd AS h
      FROM daily d JOIN train t ON d.event_type = t.event_type
    ),
    pre AS (
      SELECT event_type, day, h,
             SUM(a) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM adj
    ),
    cusum AS (
      SELECT event_type, day, h,
             c - LEAST(0.0, MIN(c) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM pre
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           ROUND(MAX(s), 6) AS max_cusum,
           ROUND(MAX(h), 6) AS threshold,
           CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
           MIN(CASE WHEN s > h THEN day END) AS first_alarm_day
    FROM cusum GROUP BY event_type
"""


@register("cusum_events", _CUSUM_SQL)
def cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("dm"))
    train = (
        daily.filter(F.col("day") < F.lit("2024-01-16").cast("date"))
        .groupBy("event_type")
        .agg(
            F.avg("dm").alias("mu0"),
            F.sqrt(F.avg(F.col("dm") * F.col("dm")) - F.avg("dm") * F.avg("dm")).alias(
                "sd"
            ),
        )
    )
    adj = daily.join(train, "event_type").select(
        "event_type",
        "day",
        (F.col("dm") - F.col("mu0") - 0.5 * F.col("sd")).alias("a"),
        (4.0 * F.col("sd")).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = adj.select(
        "event_type", "day", "h", F.sum("a").over(w).alias("c")
    ).withColumn("runmin", F.least(F.lit(0.0), F.min("c").over(w)))
    cusum = pre.select(
        "event_type", "day", "h", (F.col("c") - F.col("runmin")).alias("s")
    )
    return cusum.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.max("s"), 6).alias("max_cusum"),
        F.round(F.max("h"), 6).alias("threshold"),
        F.sum(F.when(F.col("s") > F.col("h"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarm_days"),
        F.min(F.when(F.col("s") > F.col("h"), F.col("day"))).alias("first_alarm_day"),
    )


_BH_B = 16
_BH_Q = 0.25

_BH_SQL = f"""
    WITH base AS (
      SELECT event_type, event_id, value,
             CASE WHEN CAST(('0x' || substr(md5('bh-obs#' || CAST(event_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE 0 END AS arm_a
      FROM events
    ),
    obs AS (
      SELECT event_type,
             abs(AVG(CASE WHEN arm_a = 1 THEN value END)
                 - AVG(CASE WHEN arm_a = 0 THEN value END)) AS d_obs
      FROM base GROUP BY event_type
    ),
    fan AS (
      SELECT b.event_type, r.rep, b.value,
             CASE WHEN CAST(('0x' || substr(md5('bhperm' || CAST(r.rep AS VARCHAR) || '#' ||
                    CAST(b.event_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 = 0
                  THEN 1 ELSE 0 END AS arm_a
      FROM base b, (SELECT unnest(range(1, {_BH_B + 1})) AS rep) r
    ),
    perms AS (
      SELECT event_type, rep,
             abs(AVG(CASE WHEN arm_a = 1 THEN value END)
                 - AVG(CASE WHEN arm_a = 0 THEN value END)) AS d
      FROM fan GROUP BY event_type, rep
    ),
    pvals AS (
      SELECT o.event_type,
             (1.0 + SUM(CASE WHEN p.d >= o.d_obs THEN 1 ELSE 0 END)) / (1.0 + {_BH_B})
               AS p
      FROM obs o JOIN perms p ON o.event_type = p.event_type
      GROUP BY o.event_type
    ),
    ranked AS (
      SELECT event_type, p,
             row_number() OVER (ORDER BY p, event_type) AS rk,
             COUNT(*) OVER () AS m
      FROM pvals
    ),
    flagged AS (
      SELECT event_type, p, rk, m,
             {_BH_Q} * rk / m AS crit,
             CASE WHEN p <= {_BH_Q} * rk / m THEN rk END AS ok_rk
      FROM ranked
    )
    SELECT event_type, ROUND(p, 6) AS p_value, rk, ROUND(crit, 6) AS bh_crit,
           CAST(rk <= COALESCE(MAX(ok_rk) OVER (), 0) AS INTEGER) AS rejected
    FROM flagged
"""


@register("bh_fdr_events", _BH_SQL)
def bh_fdr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def arm(salt_col):
        return F.when(
            F.pmod(
                F.conv(F.substring(F.md5(salt_col), 1, 4), 16, 10).cast("long"), F.lit(2)
            )
            == 0,
            1,
        ).otherwise(0)

    base = ev.select(
        "event_type",
        "event_id",
        "value",
        arm(F.concat(F.lit("bh-obs#"), F.col("event_id").cast("string"))).alias("arm_a"),
    )

    def absdiff():
        return F.abs(
            F.avg(F.when(F.col("arm_a") == 1, F.col("value")))
            - F.avg(F.when(F.col("arm_a") == 0, F.col("value")))
        )

    obs = base.groupBy("event_type").agg(absdiff().alias("d_obs"))
    fan = base.select(
        "event_type",
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(_BH_B))).alias("rep"),
    ).select(
        "event_type",
        "rep",
        "value",
        arm(
            F.concat(
                F.lit("bhperm"),
                F.col("rep").cast("string"),
                F.lit("#"),
                F.col("event_id").cast("string"),
            )
        ).alias("arm_a"),
    )
    perms = fan.groupBy("event_type", "rep").agg(absdiff().alias("d"))
    pvals = (
        obs.join(perms, "event_type")
        .groupBy("event_type")
        .agg(
            (
                (1.0 + F.sum(F.when(F.col("d") >= F.col("d_obs"), 1).otherwise(0)))
                / F.lit(1.0 + _BH_B)
            ).alias("p")
        )
    )
    # m is the (tiny) family size; the windows below run over m rows only.
    ranked = pvals.select(
        "event_type",
        "p",
        F.row_number().over(Window.orderBy("p", "event_type")).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    flagged = ranked.select(
        "event_type",
        "p",
        "rk",
        (F.lit(_BH_Q) * F.col("rk") / F.col("m")).alias("crit"),
        F.when(F.col("p") <= F.lit(_BH_Q) * F.col("rk") / F.col("m"), F.col("rk")).alias(
            "ok_rk"
        ),
    )
    return flagged.select(
        "event_type",
        F.round("p", 6).alias("p_value"),
        "rk",
        F.round("crit", 6).alias("bh_crit"),
        (
            F.col("rk")
            <= F.coalesce(F.max("ok_rk").over(Window.partitionBy()), F.lit(0))
        )
        .cast("int")
        .alias("rejected"),
    )
