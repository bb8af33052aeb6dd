"""Hundred-seventieth oracle-registry module: latent-mixture fitting
and portfolio-style variance trade-off — two closed-form optimizers
over the daily frame.

  * gmm_em_events — 1-D two-component Gaussian mixture fit to the 30
    daily mean values by THREE unrolled EM iterations in the
    registry's lockstep discipline: deterministic initialization at
    the 25th/75th discrete percentiles (sd = global sd, weights
    0.5/0.5), E-step responsibilities from exact normal densities,
    M-step parameters ROUNDED to 6 after every iteration so both
    engines follow the identical trajectory.  Emits one row per
    component (weight, mu, sigma) plus the iteration-3 expected
    complete-data log-likelihood — the building block for
    bimodality detection that mixture_weights_docs assumes given.

  * markowitz_events — two-asset minimum-variance portfolio over
    the daily purchase/click mean-value "returns": closed form
    w1* = (s2^2 - s12) / (s1^2 + s2^2 - 2 s12), the portfolio's
    variance (which the identity guarantees <= min of the two), the
    correlation, and the diversification ratio.  The 2x2 Markowitz
    solution — the quantitative answer to "how much of each feed do
    we blend" for negatively-correlated noisy signals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ITERS = 3
_SQ2PI = math.sqrt(2 * math.pi)


_DAILY = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(value), 6) AS x
      FROM events GROUP BY 1
"""


def _gmm_sql() -> str:
    blocks = [
        f"daily AS ({_DAILY})",
        """ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn,
             COUNT(*) OVER () AS nn
      FROM daily
    ),
    p0 AS (
      SELECT ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.25 * nn) AS BIGINT)
                            THEN x END), 6) AS mu1,
             ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.75 * nn) AS BIGINT)
                            THEN x END), 6) AS mu2,
             ROUND(SQRT(AVG(x * x) - AVG(x) * AVG(x)), 6) AS s1,
             ROUND(SQRT(AVG(x * x) - AVG(x) * AVG(x)), 6) AS s2,
             0.5 AS w1, 0.5 AS w2
      FROM ranked
    )""",
    ]
    dens = (
        "({w} / ({s} * CAST({c!r} AS DOUBLE))"
        " * EXP(-(x - {m}) * (x - {m}) / (2 * {s} * {s})))"
    )
    for it in range(1, _ITERS + 1):
        p = it - 1
        d1 = dens.format(w=f"p.w1", s=f"p.s1", m=f"p.mu1", c=_SQ2PI)
        d2 = dens.format(w=f"p.w2", s=f"p.s2", m=f"p.mu2", c=_SQ2PI)
        blocks.append(
            f"""e{it} AS (
      SELECT d.x, ROUND({d1} / ({d1} + {d2}), 6) AS r1
      FROM daily d CROSS JOIN p{p} p
    ),
    m{it} AS (
      SELECT SUM(r1 * x) / SUM(r1) AS m1,
             SUM((1 - r1) * x) / SUM(1 - r1) AS m2
      FROM e{it}
    ),
    p{it} AS (
      SELECT ROUND(MAX(m.m1), 6) AS mu1,
             ROUND(MAX(m.m2), 6) AS mu2,
             ROUND(SQRT(SUM(r1 * (x - m.m1) * (x - m.m1)) / SUM(r1)), 6)
               AS s1,
             ROUND(SQRT(SUM((1 - r1) * (x - m.m2) * (x - m.m2))
                        / SUM(1 - r1)), 6) AS s2,
             ROUND(AVG(r1), 6) AS w1,
             ROUND(1 - AVG(r1), 6) AS w2
      FROM e{it} CROSS JOIN m{it} m
    )"""
        )
    last = _ITERS
    d1 = dens.format(w="p.w1", s="p.s1", m="p.mu1", c=_SQ2PI)
    d2 = dens.format(w="p.w2", s="p.s2", m="p.mu2", c=_SQ2PI)
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f""",
    ll AS (
      SELECT ROUND(SUM(LN({d1} + {d2})), 6) AS ll
      FROM daily CROSS JOIN p{last} p
    )
    SELECT 1 AS component, p.w1 AS weight, p.mu1 AS mu, p.s1 AS sigma,
           l.ll AS loglik
    FROM p{last} p CROSS JOIN ll l
    UNION ALL
    SELECT 2, p.w2, p.mu2, p.s2, l.ll FROM p{last} p CROSS JOIN ll l
    ORDER BY component"""
    )


@register("gmm_em_events", _gmm_sql())
def gmm_em_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    ranked = daily.select(
        "x",
        F.row_number().over(Window.orderBy("x", "d")).alias("rn"),
    ).crossJoin(F.broadcast(daily.agg(F.count("*").alias("nn"))))
    p = ranked.agg(
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.25 * F.col("nn")).cast("long"),
                    F.col("x"),
                )
            ),
            6,
        ).alias("mu1"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.75 * F.col("nn")).cast("long"),
                    F.col("x"),
                )
            ),
            6,
        ).alias("mu2"),
        F.round(
            F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")), 6
        ).alias("s1"),
        F.round(
            F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")), 6
        ).alias("s2"),
        F.lit(0.5).alias("w1"),
        F.lit(0.5).alias("w2"),
    )

    def dens(w, s, m):
        return (
            F.col(w)
            / (F.col(s) * _SQ2PI)
            * F.exp(
                -(F.col("x") - F.col(m))
                * (F.col("x") - F.col(m))
                / (2 * F.col(s) * F.col(s))
            )
        )

    for _ in range(_ITERS):
        e = daily.crossJoin(F.broadcast(p)).select(
            "x",
            F.round(
                dens("w1", "s1", "mu1")
                / (dens("w1", "s1", "mu1") + dens("w2", "s2", "mu2")),
                6,
            ).alias("r1"),
        )
        mu = e.agg(
            (F.sum(F.col("r1") * F.col("x")) / F.sum("r1")).alias("m1"),
            (
                F.sum((1 - F.col("r1")) * F.col("x")) / F.sum(1 - F.col("r1"))
            ).alias("m2"),
        )
        p = (
            e.crossJoin(F.broadcast(mu))
            .agg(
                F.round(F.max("m1"), 6).alias("mu1"),
                F.round(F.max("m2"), 6).alias("mu2"),
                F.round(
                    F.sqrt(
                        F.sum(
                            F.col("r1")
                            * (F.col("x") - F.col("m1"))
                            * (F.col("x") - F.col("m1"))
                        )
                        / F.sum("r1")
                    ),
                    6,
                ).alias("s1"),
                F.round(
                    F.sqrt(
                        F.sum(
                            (1 - F.col("r1"))
                            * (F.col("x") - F.col("m2"))
                            * (F.col("x") - F.col("m2"))
                        )
                        / F.sum(1 - F.col("r1"))
                    ),
                    6,
                ).alias("s2"),
                F.round(F.avg("r1"), 6).alias("w1"),
                F.round(1 - F.avg("r1"), 6).alias("w2"),
            )
        )
    ll = (
        daily.crossJoin(F.broadcast(p))
        .agg(
            F.round(
                F.sum(
                    F.log(
                        dens("w1", "s1", "mu1") + dens("w2", "s2", "mu2")
                    )
                ),
                6,
            ).alias("ll")
        )
    )
    final = p.crossJoin(F.broadcast(ll))
    c1 = final.select(
        F.lit(1).alias("component"),
        F.col("w1").alias("weight"),
        F.col("mu1").alias("mu"),
        F.col("s1").alias("sigma"),
        F.col("ll").alias("loglik"),
    )
    c2 = final.select(
        F.lit(2).alias("component"),
        F.col("w2").alias("weight"),
        F.col("mu2").alias("mu"),
        F.col("s2").alias("sigma"),
        F.col("ll").alias("loglik"),
    )
    return c1.unionByName(c2).orderBy("component")


_MARKOWITZ_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
               AS x,
             ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
               AS y
      FROM events GROUP BY 1
    ),
    ok AS (SELECT * FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
    mom AS (
      SELECT COUNT(*) AS n,
             AVG(x * x) - AVG(x) * AVG(x) AS v1,
             AVG(y * y) - AVG(y) * AVG(y) AS v2,
             AVG(x * y) - AVG(x) * AVG(y) AS c12
      FROM ok
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((v2 - c12) / (v1 + v2 - 2 * c12), 6) AS w1,
           ROUND(1 - (v2 - c12) / (v1 + v2 - 2 * c12), 6) AS w2,
           ROUND(v1, 6) AS var1, ROUND(v2, 6) AS var2,
           ROUND(c12 / SQRT(v1 * v2), 6) AS corr,
           ROUND((v1 * v2 - c12 * c12) / (v1 + v2 - 2 * c12), 6)
             AS port_var,
           ROUND(LEAST(v1, v2)
                 - (v1 * v2 - c12 * c12) / (v1 + v2 - 2 * c12), 6)
             AS var_saved
    FROM mom
"""


@register("markowitz_events", _MARKOWITZ_SQL)
def markowitz_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("x"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("y"),
    )
    ok = daily.where(F.col("x").isNotNull() & F.col("y").isNotNull())
    mom = ok.agg(
        F.count("*").alias("n"),
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("v1"),
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("v2"),
        (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias("c12"),
    )
    w1 = (F.col("v2") - F.col("c12")) / (
        F.col("v1") + F.col("v2") - 2 * F.col("c12")
    )
    pv = (F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12")) / (
        F.col("v1") + F.col("v2") - 2 * F.col("c12")
    )
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(w1, 6).alias("w1"),
        F.round(1 - w1, 6).alias("w2"),
        F.round("v1", 6).alias("var1"),
        F.round("v2", 6).alias("var2"),
        F.round(F.col("c12") / F.sqrt(F.col("v1") * F.col("v2")), 6).alias(
            "corr"
        ),
        F.round(pv, 6).alias("port_var"),
        F.round(F.least("v1", "v2") - pv, 6).alias("var_saved"),
    )
