"""Hundred-twenty-second oracle-registry module: the hash-gate
foundation audit and digit forensics.

  * hash_uniformity_events — the audit underneath every md5-gated
    op in this registry (splits, samples, arms, folds, shuffles,
    shards): event ids hashed into 64 buckets, chi-square against
    uniform, max/min bucket ratio, and a pass flag at the
    df + 3·sqrt(2·df) threshold.  The content-hash determinism
    discipline assumes md5 buckets behave uniformly on THIS key
    population — this measures it instead of assuming it.

  * last_digit_orders — last-digit forensics on integer order
    cents: chi-square of the 10 last-digit frequencies against
    uniform.  Genuine transaction amounts have uniform last digits
    where fabricated or rounded data do not — the terminal-digit
    complement of benford_totalprice (which audits FIRST digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NB = 64

_HU_SQL = f"""
    WITH buckets AS (
      SELECT CAST(('0x' || substr(md5('unif-v1#' || CAST(event_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_NB} AS b
      FROM events
    ),
    cells AS (SELECT b, COUNT(*) AS c FROM buckets GROUP BY b),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS k FROM cells),
    chi AS (
      SELECT t.n, t.k,
             SUM(pow(c.c - t.n * 1.0 / {_NB}, 2) / (t.n * 1.0 / {_NB})) AS chi2,
             MAX(c.c) AS mx, MIN(c.c) AS mn
      FROM cells c CROSS JOIN tot t GROUP BY t.n, t.k
    )
    SELECT CAST(n AS BIGINT) AS n_keys, CAST(k AS BIGINT) AS n_buckets_hit,
           ROUND(chi2, 6) AS chi2,
           ROUND(mx * 1.0 / mn, 6) AS max_min_ratio,
           CAST(chi2 < {_NB - 1} + 3.0 * sqrt(2.0 * {_NB - 1}) AS INTEGER)
             AS uniform_ok
    FROM chi
"""


@register("hash_uniformity_events", _HU_SQL)
def hash_uniformity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    buckets = ev.select(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("unif-v1#"), F.col("event_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_NB),
        ).alias("b")
    )
    cells = buckets.groupBy("b").agg(F.count("*").alias("c"))
    tot = cells.agg(F.sum("c").alias("n"), F.count("*").alias("k"))
    exp = F.col("n") * 1.0 / _NB
    chi = cells.crossJoin(tot).groupBy("n", "k").agg(
        F.sum(F.pow(F.col("c") - exp, 2) / exp).alias("chi2"),
        F.max("c").alias("mx"),
        F.min("c").alias("mn"),
    )
    thresh = (_NB - 1) + 3.0 * (2.0 * (_NB - 1)) ** 0.5
    return chi.select(
        F.col("n").cast("long").alias("n_keys"),
        F.col("k").cast("long").alias("n_buckets_hit"),
        F.round("chi2", 6).alias("chi2"),
        F.round(F.col("mx") * 1.0 / F.col("mn"), 6).alias("max_min_ratio"),
        (F.col("chi2") < F.lit(thresh)).cast("int").alias("uniform_ok"),
    )


_LD_SQL = """
    WITH digits AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 10 AS d FROM orders
    ),
    cells AS (SELECT d, COUNT(*) AS c FROM digits GROUP BY d),
    tot AS (SELECT SUM(c) AS n FROM cells)
    SELECT CAST(t.n AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_digits_seen,
           ROUND(SUM(pow(c.c - t.n / 10.0, 2) / (t.n / 10.0)), 6) AS chi2,
           CAST(SUM(pow(c.c - t.n / 10.0, 2) / (t.n / 10.0)) < 16.919 AS INTEGER)
             AS uniform_ok
    FROM cells c CROSS JOIN tot t
    GROUP BY t.n
"""


@register("last_digit_orders", _LD_SQL)
def last_digit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    digits = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 10).alias("d")
    )
    cells = digits.groupBy("d").agg(F.count("*").alias("c"))
    tot = cells.agg(F.sum("c").alias("n"))
    exp = F.col("n") / 10.0
    return (
        cells.crossJoin(tot)
        .groupBy("n")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.pow(F.col("c") - exp, 2) / exp).alias("chi2"),
        )
        .select(
            F.col("n").cast("long").alias("n_orders"),
            F.col("k").cast("long").alias("n_digits_seen"),
            F.round("chi2", 6).alias("chi2"),
            (F.col("chi2") < 16.919).cast("int").alias("uniform_ok"),
        )
    )
