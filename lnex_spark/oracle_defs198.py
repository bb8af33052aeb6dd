"""Hundred-ninety-eighth oracle-registry module: psychometric item
calibration over the user × event-type "response matrix" (user
passes an item if their mean value for that type exceeds 50) — the
measurement-theory layer under any rubric-scored eval set.

  * rasch_prox_events — Rasch 1PL item difficulties by the PROX
    (normal-approximation) method: initial logits d_i =
    ln((N - s_i)/s_i) centered, person logits a_u = ln(r_u/(k -
    r_u)) for non-extreme scores, then the closed-form expansion
    X_d = sqrt((1 + V_a/2.9)/(1 - V_a V_d / 8.35)) (and its dual
    for persons).  One aggregate pass per side, no EM — the
    standard warm-start every IRT fitter uses, sufficient on its
    own for item ranking / misfit screening.

  * guttman_events — Guttman scalogram coefficient of
    reproducibility: order items easiest→hardest by pass rate
    (tie-broken by name), count response-pair inversions (easier
    item failed while a harder one passed) over all user × item
    pairs; CR = 1 - errors / (n_users * n_items).  CR >= 0.9 is the
    classical bar for "the items form a scale" — i.e., one latent
    dimension explains the pass pattern, the precondition Rasch
    assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_RESP = """resp AS (
      SELECT user_id, event_type,
             CASE WHEN AVG(value) > 50 THEN 1 ELSE 0 END AS r
      FROM events GROUP BY user_id, event_type
    )"""


_RASCH_SQL = f"""
    WITH {_RESP},
    items AS (
      SELECT event_type, SUM(r) AS s, COUNT(*) AS n
      FROM resp GROUP BY event_type
    ),
    d0 AS (
      SELECT event_type,
             LN(CAST(n - s AS DOUBLE) / s) AS d
      FROM items WHERE s > 0 AND s < n
    ),
    dc AS (
      SELECT event_type, d - AVG(d) OVER () AS d FROM d0
    ),
    persons AS (
      SELECT user_id, SUM(r) AS rs, COUNT(*) AS k
      FROM resp GROUP BY user_id
    ),
    a0 AS (
      SELECT LN(CAST(rs AS DOUBLE) / (k - rs)) AS a
      FROM persons WHERE rs > 0 AND rs < k
    ),
    vars_ AS (
      SELECT (SELECT AVG(d * d) - AVG(d) * AVG(d) FROM dc) AS vd,
             (SELECT AVG(a * a) - AVG(a) * AVG(a) FROM a0) AS va
    )
    SELECT dc.event_type,
           ROUND(dc.d, 6) AS prox_initial,
           ROUND(dc.d * SQRT((1 + v.va / 2.9)
                             / (1 - v.va * v.vd / 8.35)), 6)
             AS prox_difficulty,
           ROUND(v.va, 6) AS person_var,
           ROUND(v.vd, 6) AS item_var
    FROM dc CROSS JOIN vars_ v
    ORDER BY dc.event_type
"""


@register("rasch_prox_events", _RASCH_SQL)
def rasch_prox_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    resp = ev.groupBy("user_id", "event_type").agg(
        F.when(F.avg("value") > 50, 1).otherwise(0).alias("r")
    )
    items = resp.groupBy("event_type").agg(
        F.sum("r").alias("s"), F.count("*").alias("n")
    )
    d0 = items.where((F.col("s") > 0) & (F.col("s") < F.col("n"))).select(
        "event_type",
        F.log((F.col("n") - F.col("s")).cast("double") / F.col("s")).alias(
            "d"
        ),
    )
    dmean = d0.agg(F.avg("d").alias("dm"))
    dc = d0.crossJoin(F.broadcast(dmean)).select(
        "event_type", (F.col("d") - F.col("dm")).alias("d")
    )
    persons = resp.groupBy("user_id").agg(
        F.sum("r").alias("rs"), F.count("*").alias("k")
    )
    a0 = persons.where(
        (F.col("rs") > 0) & (F.col("rs") < F.col("k"))
    ).select(
        F.log(F.col("rs").cast("double") / (F.col("k") - F.col("rs"))).alias(
            "a"
        )
    )
    vd = dc.agg(
        (F.avg(F.col("d") * F.col("d")) - F.avg("d") * F.avg("d")).alias("vd")
    )
    va = a0.agg(
        (F.avg(F.col("a") * F.col("a")) - F.avg("a") * F.avg("a")).alias("va")
    )
    return (
        dc.crossJoin(F.broadcast(vd))
        .crossJoin(F.broadcast(va))
        .select(
            "event_type",
            F.round("d", 6).alias("prox_initial"),
            F.round(
                F.col("d")
                * F.sqrt(
                    (1 + F.col("va") / 2.9)
                    / (1 - F.col("va") * F.col("vd") / 8.35)
                ),
                6,
            ).alias("prox_difficulty"),
            F.round("va", 6).alias("person_var"),
            F.round("vd", 6).alias("item_var"),
        )
        .orderBy("event_type")
    )


_GUTTMAN_SQL = f"""
    WITH {_RESP},
    items AS (
      SELECT event_type, AVG(CAST(r AS DOUBLE)) AS p
      FROM resp GROUP BY event_type
    ),
    ordered AS (
      SELECT event_type, p,
             ROW_NUMBER() OVER (ORDER BY p DESC, event_type) AS rank_easy
      FROM items
    ),
    joined AS (
      SELECT r.user_id, o.rank_easy, r.r
      FROM resp r JOIN ordered o ON o.event_type = r.event_type
    ),
    errors AS (
      SELECT COUNT(*) AS e
      FROM joined a JOIN joined b
        ON a.user_id = b.user_id AND a.rank_easy < b.rank_easy
      WHERE a.r = 0 AND b.r = 1
    ),
    dims AS (
      SELECT COUNT(DISTINCT user_id) AS nu,
             COUNT(DISTINCT rank_easy) AS k
      FROM joined
    )
    SELECT CAST(d.nu AS BIGINT) AS n_users,
           CAST(d.k AS BIGINT) AS n_items,
           CAST(e.e AS BIGINT) AS guttman_errors,
           ROUND(1 - CAST(e.e AS DOUBLE) / (d.nu * d.k), 6)
             AS reproducibility
    FROM errors e CROSS JOIN dims d
"""


@register("guttman_events", _GUTTMAN_SQL)
def guttman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    resp = ev.groupBy("user_id", "event_type").agg(
        F.when(F.avg("value") > 50, 1).otherwise(0).alias("r")
    )
    items = resp.groupBy("event_type").agg(
        F.avg(F.col("r").cast("double")).alias("p")
    )
    ordered = items.select(
        "event_type",
        F.row_number()
        .over(Window.orderBy(F.desc("p"), "event_type"))
        .alias("rank_easy"),
    )
    joined = resp.join(F.broadcast(ordered), "event_type").select(
        "user_id", "rank_easy", "r"
    )
    a = joined.alias("a")
    b = joined.alias("b")
    errors = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.rank_easy") < F.col("b.rank_easy")),
        )
        .where((F.col("a.r") == 0) & (F.col("b.r") == 1))
        .agg(F.count("*").alias("e"))
    )
    dims = joined.agg(
        F.countDistinct("user_id").alias("nu"),
        F.countDistinct("rank_easy").alias("k"),
    )
    return errors.crossJoin(F.broadcast(dims)).select(
        F.col("nu").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_items"),
        F.col("e").cast("long").alias("guttman_errors"),
        F.round(
            1 - F.col("e").cast("double") / (F.col("nu") * F.col("k")), 6
        ).alias("reproducibility"),
    )
