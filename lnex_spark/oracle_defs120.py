"""Hundred-twentieth oracle-registry module: optimal stopping and
exact feature attribution.

  * secretary_rule_events — the 1/e-rule optimal-stopping replay:
    for each user's event stream in time order, observe the first
    floor(0.37·n) events, then accept the first later event whose
    value beats that benchmark (falling back to the last event).
    Emits how often the rule captures the true maximum vs the 1/e
    theoretical success rate and vs the naive expected rate of a
    random pick.  The sequential-decision primitive behind
    "stop scanning candidates and commit" policies, entirely in
    per-user windows.

  * shapley_r2_events — EXACT Shapley attribution for a
    two-feature model: explaining today's error count with
    features A = errors' own lag and B = clicks' lag, coalition
    values v(S) = R² of the OLS fit on S (closed-form from the
    granger_events raw moments), Shapley_A = ½(v{A}−v∅) +
    ½(v{A,B}−v{B}) and symmetrically for B — summing exactly to the
    full-model R².  The attribution question answered exactly where
    it IS exact (two features), instead of sampled — the ground
    truth any approximate Shapley implementation should be tested
    against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SEC_SQL = """
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             MAX(value) OVER (PARTITION BY user_id) AS true_max
      FROM events
    ),
    marked AS (
      SELECT user_id, value, pos, n, true_max,
             (n * 37) // 100 AS r
      FROM ordered
    ),
    bench AS (
      SELECT user_id, MAX(value) AS benchmark
      FROM marked WHERE pos <= r GROUP BY user_id
    ),
    candidates AS (
      SELECT m.user_id,
             MIN(CASE WHEN m.pos > m.r AND m.value > b.benchmark
                      THEN m.pos END) AS pick_pos
      FROM marked m JOIN bench b ON m.user_id = b.user_id
      GROUP BY m.user_id
    ),
    picks AS (
      SELECT m.user_id, m.true_max, m.value AS picked
      FROM marked m
      JOIN candidates c ON c.user_id = m.user_id
       AND m.pos = COALESCE(c.pick_pos, m.n)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN picked = true_max THEN 1 ELSE 0 END) AS BIGINT)
             AS n_captured_max,
           ROUND(AVG(CASE WHEN picked = true_max THEN 1.0 ELSE 0.0 END), 6)
             AS success_rate,
           ROUND(exp(-1.0), 6) AS theory_1_over_e,
           ROUND(AVG(1.0 / (SELECT AVG(n * 1.0) FROM (SELECT DISTINCT user_id, n
                  FROM marked))), 6) AS naive_random_rate
    FROM picks
"""


@register("secretary_rule_events", _SEC_SQL)
def secretary_rule_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    marked = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(wp).alias("n"),
        F.max("value").over(wp).alias("true_max"),
    ).withColumn("r", F.floor(F.col("n") * 37 / 100))
    bench = (
        marked.filter(F.col("pos") <= F.col("r"))
        .groupBy("user_id")
        .agg(F.max("value").alias("benchmark"))
    )
    candidates = (
        marked.join(bench, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("pos") > F.col("r")) & (F.col("value") > F.col("benchmark")),
                    F.col("pos"),
                )
            ).alias("pick_pos")
        )
    )
    picks = marked.join(candidates, "user_id").filter(
        F.col("pos") == F.coalesce(F.col("pick_pos"), F.col("n"))
    )
    mean_n = (
        marked.select("user_id", "n").distinct().agg(F.avg(F.col("n") * 1.0).alias("mn"))
    )
    return picks.crossJoin(mean_n).agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(F.col("value") == F.col("true_max"), 1).otherwise(0))
        .cast("long")
        .alias("n_captured_max"),
        F.round(
            F.avg(F.when(F.col("value") == F.col("true_max"), 1.0).otherwise(0.0)), 6
        ).alias("success_rate"),
        F.round(F.exp(F.lit(-1.0)), 6).alias("theory_1_over_e"),
        F.round(F.avg(1.0 / F.col("mn")), 6).alias("naive_random_rate"),
    )


_SHAP_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1.0 AS x,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT y,
             lag(y) OVER (ORDER BY day) AS a,
             lag(x) OVER (ORDER BY day) AS b
      FROM daily
    ),
    obs AS (SELECT y, a, b FROM lagged WHERE a IS NOT NULL AND b IS NOT NULL),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(y * y) - AVG(y) * AVG(y) AS vy,
             AVG(a * a) - AVG(a) * AVG(a) AS va,
             AVG(b * b) - AVG(b) * AVG(b) AS vb,
             AVG(y * a) - AVG(y) * AVG(a) AS cya,
             AVG(y * b) - AVG(y) * AVG(b) AS cyb,
             AVG(a * b) - AVG(a) * AVG(b) AS cab
      FROM obs
    ),
    vals AS (
      SELECT n,
             cya * cya / (va * vy) AS v_a,
             cyb * cyb / (vb * vy) AS v_b,
             (cya * cya * vb - 2.0 * cya * cyb * cab + cyb * cyb * va)
               / ((va * vb - cab * cab) * vy) AS v_ab
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(v_a, 6) AS r2_a_alone,
           ROUND(v_b, 6) AS r2_b_alone,
           ROUND(v_ab, 6) AS r2_full,
           ROUND(0.5 * v_a + 0.5 * (v_ab - v_b), 6) AS shapley_a,
           ROUND(0.5 * v_b + 0.5 * (v_ab - v_a), 6) AS shapley_b
    FROM vals
"""


@register("shapley_r2_events", _SHAP_SQL)
def shapley_r2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        (F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) * 1.0).alias(
            "x"
        ),
        (F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)) * 1.0).alias(
            "y"
        ),
    )
    w = Window.orderBy("day")
    obs = daily.select(
        "y", F.lag("y").over(w).alias("a"), F.lag("x").over(w).alias("b")
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())

    def cov(p, q):
        return F.avg(F.col(p) * F.col(q)) - F.avg(p) * F.avg(q)

    mom = obs.agg(
        F.count("*").alias("n"),
        cov("y", "y").alias("vy"),
        cov("a", "a").alias("va"),
        cov("b", "b").alias("vb"),
        cov("y", "a").alias("cya"),
        cov("y", "b").alias("cyb"),
        cov("a", "b").alias("cab"),
    )
    v_a = F.col("cya") * F.col("cya") / (F.col("va") * F.col("vy"))
    v_b = F.col("cyb") * F.col("cyb") / (F.col("vb") * F.col("vy"))
    v_ab = (
        F.col("cya") * F.col("cya") * F.col("vb")
        - 2.0 * F.col("cya") * F.col("cyb") * F.col("cab")
        + F.col("cyb") * F.col("cyb") * F.col("va")
    ) / ((F.col("va") * F.col("vb") - F.col("cab") * F.col("cab")) * F.col("vy"))
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(v_a, 6).alias("r2_a_alone"),
        F.round(v_b, 6).alias("r2_b_alone"),
        F.round(v_ab, 6).alias("r2_full"),
        F.round(0.5 * v_a + 0.5 * (v_ab - v_b), 6).alias("shapley_a"),
        F.round(0.5 * v_b + 0.5 * (v_ab - v_a), 6).alias("shapley_b"),
    )
