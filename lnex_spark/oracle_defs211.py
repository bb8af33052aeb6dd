"""Two-hundred-eleventh oracle-registry module: time-series data
mining on the daily value series — the matrix-profile and SAX
primitives behind modern motif/anomaly search.

  * matrix_profile_events — matrix profile with window m = 7 days:
    every length-7 subsequence z-normalized (its own mean/sd), the
    profile value is the minimum Euclidean distance to any
    non-overlapping other subsequence (|i - j| >= m, the standard
    trivial-match exclusion).  The global minimum pair is the MOTIF
    (the week that repeats), the maximum is the DISCORD (the week
    like no other) — both flagged in the output.  The subsequence ×
    subsequence join is bounded by (days - m + 1)^2, constant in
    event volume.

  * sax_words_events — Symbolic Aggregate approXimation: z-score
    the daily series globally, slide a 6-day window, PAA-average
    into 3 segments of 2 days, map each segment to {a, b, c} at the
    Gaussian tercile breakpoints ±0.4307 — each window becomes a
    3-letter word.  Emits the word histogram: repeated words =
    recurring weekly shapes (cheap motif index), hapax words =
    discord candidates; the discretization LSH that makes
    subsequence search textual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register

_M = 7
_BP = 0.4307


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SERIES = """
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS y
      FROM events GROUP BY 1
    ),
    ser AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i, y FROM daily
    )
"""


_MP_SQL = f"""
    WITH {_SERIES},
    wins AS (
      SELECT w.i AS w, s.i - w.i AS off, s.y
      FROM (SELECT i FROM ser WHERE i <= (SELECT MAX(i) FROM ser) - {_M - 1})
           w
      JOIN ser s ON s.i BETWEEN w.i AND w.i + {_M - 1}
    ),
    stats AS (
      SELECT w, AVG(y) AS mu,
             SQRT(AVG(y * y) - AVG(y) * AVG(y)) AS sd
      FROM wins GROUP BY w
    ),
    zn AS (
      SELECT wi.w, wi.off, (wi.y - st.mu) / st.sd AS z
      FROM wins wi JOIN stats st ON st.w = wi.w
    ),
    dists AS (
      SELECT a.w AS wa, b.w AS wb,
             SQRT(SUM((a.z - b.z) * (a.z - b.z))) AS dist
      FROM zn a JOIN zn b ON a.off = b.off AND ABS(a.w - b.w) >= {_M}
      GROUP BY a.w, b.w
    ),
    profile AS (
      SELECT wa AS w, MIN(dist) AS mp FROM dists GROUP BY wa
    ),
    nn AS (
      SELECT d.wa AS w, MIN(d.wb) AS nn_idx, p.mp
      FROM dists d JOIN profile p ON p.w = d.wa AND d.dist = p.mp
      GROUP BY d.wa, p.mp
    ),
    ext AS (
      SELECT MIN(mp) AS motif_d, MAX(mp) AS discord_d FROM profile
    )
    SELECT n.w AS window_start,
           ROUND(n.mp, 6) AS profile_dist,
           CAST(n.nn_idx AS BIGINT) AS nn_window,
           CASE WHEN n.mp = (SELECT motif_d FROM ext) THEN 1 ELSE 0 END
             AS is_motif,
           CASE WHEN n.mp = (SELECT discord_d FROM ext) THEN 1 ELSE 0 END
             AS is_discord
    FROM nn n
    ORDER BY window_start
"""


@register("matrix_profile_events", _MP_SQL)
def matrix_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    ser = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"), "y"
    )
    maxi = ser.agg(F.max("i").alias("mx"))
    starts = (
        ser.crossJoin(F.broadcast(maxi))
        .where(F.col("i") <= F.col("mx") - (_M - 1))
        .select(F.col("i").alias("w"))
    )
    wins = starts.join(
        ser,
        (F.col("i") >= F.col("w")) & (F.col("i") <= F.col("w") + (_M - 1)),
    ).select("w", (F.col("i") - F.col("w")).alias("off"), "y")
    stats = wins.groupBy("w").agg(
        F.avg("y").alias("mu"),
        F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias(
            "sd"
        ),
    )
    zn = wins.join(stats, "w").select(
        "w", "off", ((F.col("y") - F.col("mu")) / F.col("sd")).alias("z")
    )
    a = zn.select(
        F.col("w").alias("wa"), F.col("off").alias("o"), F.col("z").alias("za")
    )
    b = zn.select(
        F.col("w").alias("wb"), F.col("off").alias("o"), F.col("z").alias("zb")
    )
    dists = (
        a.join(b, "o")
        .where(F.abs(F.col("wa") - F.col("wb")) >= _M)
        .groupBy("wa", "wb")
        .agg(
            F.sqrt(
                F.sum((F.col("za") - F.col("zb")) * (F.col("za") - F.col("zb")))
            ).alias("dist")
        )
    )
    profile = dists.groupBy("wa").agg(F.min("dist").alias("mp"))
    nn = (
        dists.join(profile, "wa")
        .where(F.col("dist") == F.col("mp"))
        .groupBy("wa", "mp")
        .agg(F.min("wb").alias("nn_idx"))
    )
    ext = profile.agg(
        F.min("mp").alias("motif_d"), F.max("mp").alias("discord_d")
    )
    return (
        nn.crossJoin(F.broadcast(ext))
        .select(
            F.col("wa").alias("window_start"),
            F.round("mp", 6).alias("profile_dist"),
            F.col("nn_idx").cast("long").alias("nn_window"),
            F.when(F.col("mp") == F.col("motif_d"), 1)
            .otherwise(0)
            .alias("is_motif"),
            F.when(F.col("mp") == F.col("discord_d"), 1)
            .otherwise(0)
            .alias("is_discord"),
        )
        .orderBy("window_start")
    )


_SAX_SQL = f"""
    WITH {_SERIES},
    mom AS (
      SELECT AVG(y) AS mu, SQRT(AVG(y * y) - AVG(y) * AVG(y)) AS sd
      FROM ser
    ),
    z AS (
      SELECT i, (y - (SELECT mu FROM mom)) / (SELECT sd FROM mom) AS z
      FROM ser
    ),
    wins AS (
      SELECT w.i AS w,
             CAST(FLOOR((s.i - w.i) / 2) AS INTEGER) AS seg, s.z
      FROM (SELECT i FROM z WHERE i <= (SELECT MAX(i) FROM z) - 5) w
      JOIN z s ON s.i BETWEEN w.i AND w.i + 5
    ),
    paa AS (
      SELECT w, seg, AVG(z) AS m FROM wins GROUP BY w, seg
    ),
    letters AS (
      SELECT w, seg,
             CASE WHEN m < -{_BP!r} THEN 'a'
                  WHEN m < {_BP!r} THEN 'b' ELSE 'c' END AS l
      FROM paa
    ),
    words AS (
      SELECT w, STRING_AGG(l, '' ORDER BY seg) AS word
      FROM letters GROUP BY w
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(MIN(w) AS BIGINT) AS first_start
    FROM words
    GROUP BY word
    ORDER BY n_windows DESC, word
"""


@register("sax_words_events", _SAX_SQL)
def sax_words_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    ser = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("i"), "y"
    )
    mom = ser.agg(
        F.avg("y").alias("mu"),
        F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias(
            "sd"
        ),
    )
    z = ser.crossJoin(F.broadcast(mom)).select(
        "i", ((F.col("y") - F.col("mu")) / F.col("sd")).alias("z")
    )
    maxi = z.agg(F.max("i").alias("mx"))
    starts = (
        z.crossJoin(F.broadcast(maxi))
        .where(F.col("i") <= F.col("mx") - 5)
        .select(F.col("i").alias("w"))
    )
    wins = starts.join(
        z, (F.col("i") >= F.col("w")) & (F.col("i") <= F.col("w") + 5)
    ).select(
        "w",
        F.floor((F.col("i") - F.col("w")) / 2).cast("int").alias("seg"),
        "z",
    )
    paa = wins.groupBy("w", "seg").agg(F.avg("z").alias("m"))
    letters = paa.select(
        "w",
        "seg",
        F.when(F.col("m") < -_BP, "a")
        .when(F.col("m") < _BP, "b")
        .otherwise("c")
        .alias("l"),
    )
    words = letters.groupBy("w").agg(
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("seg", "l"))).getField("l"),
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.min("w").cast("long").alias("first_start"),
        )
        .orderBy(F.desc("n_windows"), "word")
    )
