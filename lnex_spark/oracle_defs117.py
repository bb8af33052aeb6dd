"""Hundred-seventeenth oracle-registry module: preference ranking and
local sequence alignment.

  * bradley_terry_events — Bradley-Terry strengths for the five
    event types from daily pairwise "wins" (type A beats B on days
    its count is strictly higher): two unrolled
    minorization-maximization rounds p_i ← w_i / Σ_j n_ij/(p_i+p_j)
    with per-round sum-normalization and rounding (the iterative-
    solver determinism discipline), plus the final ranking.  The
    pairwise-comparison-to-global-ranking primitive behind LLM
    preference leaderboards — win matrices in, strengths out.

  * smith_waterman_events — Smith-Waterman LOCAL alignment between
    the first 8 event types of users 0 and 1 (match +2, mismatch
    −1, gap −1): the same anti-diagonal wavefront as
    dtw_profiles_events but with the max(0, ·) floor and
    typed predecessors (diagonal proposals add the substitution
    score, gap proposals subtract 1), sentinel row/column zeros
    carried through the waves.  The wavefront decomposition
    generalizes: global alignment (DTW) and local alignment (SW)
    from one pattern — SW being the fuzzy-subsequence primitive
    behind near-duplicate SPAN detection where whole-doc Jaccard
    stays low.  Emits the best local score and its end cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_BT_ROUNDS = 2


def _bt_round(prev: str, cur: str) -> str:
    return f"""
    s_{cur} AS MATERIALIZED (
      SELECT a.t AS i,
             SUM(n.n_ij / (pa.p + pb.p)) AS denom,
             MAX(w.wins) AS wins
      FROM types a
      JOIN pairs n ON n.ta = a.t
      JOIN {prev} pa ON pa.t = n.ta
      JOIN {prev} pb ON pb.t = n.tb
      JOIN winsum w ON w.t = a.t
      GROUP BY a.t
    ),
    raw_{cur} AS MATERIALIZED (
      SELECT i AS t, wins / denom AS p FROM s_{cur}
    ),
    {cur} AS MATERIALIZED (
      SELECT r.t, ROUND(r.p / z.z, 6) AS p
      FROM raw_{cur} r CROSS JOIN (SELECT SUM(p) AS z FROM raw_{cur}) z
    )"""


_BT_SQL = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    duels AS MATERIALIZED (
      SELECT a.event_type AS ta, b.event_type AS tb,
             SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS w_ab,
             COUNT(*) AS n_days
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type <> b.event_type
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT ta, tb, n_days * 1.0 AS n_ij FROM duels
    ),
    winsum AS MATERIALIZED (
      SELECT ta AS t, CAST(SUM(w_ab) AS DOUBLE) AS wins FROM duels GROUP BY ta
    ),
    types AS MATERIALIZED (SELECT DISTINCT ta AS t FROM duels),
    p0 AS MATERIALIZED (
      SELECT t, ROUND(1.0 / (SELECT COUNT(*) FROM types), 6) AS p FROM types
    ),
    {_bt_round("p0", "p1")},
    {_bt_round("p1", "p2")}
    SELECT p2.t AS event_type, w.wins, p2.p AS strength,
           row_number() OVER (ORDER BY p2.p DESC, p2.t) AS rank
    FROM p2 JOIN winsum w ON w.t = p2.t
"""


@register("bradley_terry_events", _BT_SQL)
def bradley_terry_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    a = daily.select(
        F.col("day").alias("da"), F.col("event_type").alias("ta"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("event_type").alias("tb"), F.col("c").alias("cb")
    )
    duels = (
        a.join(b, (a["da"] == b["db"]) & (a["ta"] != b["tb"]))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0)).alias("w_ab"),
            F.count("*").alias("n_days"),
        )
    )
    pairs = duels.select("ta", "tb", (F.col("n_days") * 1.0).alias("n_ij"))
    winsum = duels.groupBy(F.col("ta").alias("t")).agg(
        F.sum("w_ab").cast("double").alias("wins")
    )
    types = duels.select(F.col("ta").alias("t")).distinct()
    k = types.count()
    p = types.select("t", F.round(F.lit(1.0 / k), 6).alias("p"))
    for _ in range(_BT_ROUNDS):
        denom = (
            pairs.join(p.select(F.col("t").alias("ta"), F.col("p").alias("pa")), "ta")
            .join(p.select(F.col("t").alias("tb"), F.col("p").alias("pb")), "tb")
            .groupBy("ta")
            .agg(F.sum(F.col("n_ij") / (F.col("pa") + F.col("pb"))).alias("denom"))
            .select(F.col("ta").alias("t"), "denom")
        )
        raw = winsum.join(denom, "t").select(
            "t", (F.col("wins") / F.col("denom")).alias("p")
        )
        z = raw.agg(F.sum("p").alias("z"))
        p = raw.crossJoin(z).select(
            "t", F.round(F.col("p") / F.col("z"), 6).alias("p")
        )
    return p.join(winsum, "t").select(
        F.col("t").alias("event_type"),
        "wins",
        F.col("p").alias("strength"),
        F.row_number().over(Window.orderBy(F.desc("p"), F.asc("t"))).alias("rank"),
    )


_SW_N = 8
_NEG = -1000000.0


def _sw_wave_ctes() -> str:
    parts = [
        "h0 AS MATERIALIZED (SELECT 0 AS i, 0 AS j, 0.0 AS h)",
    ]
    for d in range(1, 2 * _SW_N + 1):
        border = f"""
        SELECT i, j, h FROM (
          SELECT 0 AS i, {d} AS j, 0.0 AS h UNION ALL SELECT {d}, 0, 0.0
        ) WHERE i <= {_SW_N} AND j <= {_SW_N}"""
        deps = [
            f"SELECT i + 1 AS i, j, h, 'gap' AS kind FROM h{d - 1}",
            f"SELECT i, j + 1, h, 'gap' FROM h{d - 1}",
        ]
        if d > 1:
            deps.append(f"SELECT i + 1, j + 1, h, 'diag' FROM h{d - 2}")
        pred = " UNION ALL ".join(deps)
        parts.append(
            f"""h{d} AS MATERIALIZED (
      SELECT c.i, c.j,
             GREATEST(0.0,
               COALESCE(MAX(CASE WHEN p.kind = 'diag' THEN p.h END), {_NEG}) + c.s,
               COALESCE(MAX(CASE WHEN p.kind = 'gap' THEN p.h END), {_NEG}) - 1.0)
               AS h
      FROM cost c JOIN ({pred}) p ON p.i = c.i AND p.j = c.j
      WHERE c.i + c.j = {d} AND c.i >= 1 AND c.j >= 1
      GROUP BY c.i, c.j, c.s
      UNION ALL
      {border}
    )"""
        )
    return ",\n    ".join(parts)


_SW_SQL = f"""
    WITH seqs AS MATERIALIZED (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events WHERE user_id IN (0, 1)
    ),
    sa AS MATERIALIZED (
      SELECT pos AS i, event_type AS t FROM seqs WHERE user_id = 0 AND pos <= {_SW_N}
    ),
    sb AS MATERIALIZED (
      SELECT pos AS j, event_type AS t FROM seqs WHERE user_id = 1 AND pos <= {_SW_N}
    ),
    cost AS MATERIALIZED (
      SELECT sa.i, sb.j,
             CASE WHEN sa.t = sb.t THEN 2.0 ELSE -1.0 END AS s
      FROM sa CROSS JOIN sb
    ),
    {_sw_wave_ctes()},
    allcells AS (
      {" UNION ALL ".join(f"SELECT i, j, h FROM h{d}" for d in range(2 * _SW_N + 1))}
    ),
    best AS (
      SELECT i, j, h FROM allcells WHERE i >= 1 AND j >= 1
      ORDER BY h DESC, i, j LIMIT 1
    )
    SELECT ROUND((SELECT h FROM best), 6) AS best_score,
           (SELECT i FROM best) AS end_i,
           (SELECT j FROM best) AS end_j
"""


@register("smith_waterman_events", _SW_SQL)
def smith_waterman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isin(0, 1))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("pos")
    ).filter(F.col("pos") <= _SW_N)
    sa = seqs.filter(F.col("user_id") == 0).select(
        F.col("pos").alias("i"), F.col("event_type").alias("t_a")
    )
    sb = seqs.filter(F.col("user_id") == 1).select(
        F.col("pos").alias("j"), F.col("event_type").alias("t_b")
    )
    cost = sa.crossJoin(sb).select(
        "i", "j", F.when(F.col("t_a") == F.col("t_b"), 2.0).otherwise(-1.0).alias("s")
    )
    spark_ = ev.sparkSession
    waves: list[DataFrame] = [
        spark_.createDataFrame([(0, 0, 0.0)], "i int, j int, h double").localCheckpoint(
            eager=True
        )
    ]
    for d in range(1, 2 * _SW_N + 1):
        preds = waves[d - 1].select(
            (F.col("i") + 1).alias("i"), "j", "h", F.lit("gap").alias("kind")
        ).unionByName(
            waves[d - 1].select(
                "i", (F.col("j") + 1).alias("j"), "h", F.lit("gap").alias("kind")
            )
        )
        if d > 1:
            preds = preds.unionByName(
                waves[d - 2].select(
                    (F.col("i") + 1).alias("i"),
                    (F.col("j") + 1).alias("j"),
                    "h",
                    F.lit("diag").alias("kind"),
                )
            )
        interior = (
            cost.filter((F.col("i") + F.col("j") == d) & (F.col("i") >= 1) & (F.col("j") >= 1))
            .join(preds.withColumnRenamed("h", "ph"), ["i", "j"])
            .groupBy("i", "j", "s")
            .agg(
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(
                        F.max(F.when(F.col("kind") == "diag", F.col("ph"))),
                        F.lit(_NEG),
                    )
                    + F.col("s"),
                    F.coalesce(
                        F.max(F.when(F.col("kind") == "gap", F.col("ph"))),
                        F.lit(_NEG),
                    )
                    - 1.0,
                ).alias("h")
            )
            .select("i", "j", "h")
        )
        border_rows = [
            (0, d, 0.0) for _ in range(1) if d <= _SW_N
        ] + ([(d, 0, 0.0)] if d <= _SW_N else [])
        if border_rows:
            border = spark_.createDataFrame(border_rows, "i int, j int, h double")
            wave = interior.unionByName(border)
        else:
            wave = interior
        waves.append(wave.localCheckpoint(eager=True))
    allcells = waves[0]
    for wdf in waves[1:]:
        allcells = allcells.unionByName(wdf)
    best = (
        allcells.filter((F.col("i") >= 1) & (F.col("j") >= 1))
        .orderBy(F.desc("h"), F.asc("i"), F.asc("j"))
        .limit(1)
        .collect()[0]
    )
    return spark_.createDataFrame(
        [(round(best["h"], 6), best["i"], best["j"])],
        "best_score double, end_i int, end_j int",
    )
