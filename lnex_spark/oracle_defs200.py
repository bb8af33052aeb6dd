"""Two-hundredth oracle-registry module: higher-order information
structure of the three binarized daily move streams (purchase /
click / view up-moves) — beyond pairwise MI and transfer entropy,
HOW do three signals share information?

  * o_information_events — the O-information of the triple
    (Rosas et al.): O = TC - DTC = (2 - 3) H(X1,X2,X3)
    + sum_i [H(X_i) - H(X_{-i})]-style identity, computed here as
    O = sum H(X_i) - H(X1,X2,X3)  [total correlation]
      - [sum H(pair) - 2 H(X1,X2,X3)]  [dual total correlation],
    all plug-in entropies from the 8-cell joint histogram.  O > 0 →
    redundancy-dominated (signals repeat each other), O < 0 →
    synergy-dominated (the triple carries what no pair does) — the
    one-number triage before building multivariate features.

  * pid_events — Williams-Beer partial information decomposition of
    I(purchase_move ; click_move, view_move): redundancy =
    sum_t p(t) min_s I_spec(s; t) over the two sources' specific
    informations, unique contributions = I(S_i; T) - R, synergy =
    I(S1,S2; T) - R - U1 - U2.  Answers "do click and view tell the
    SAME story about purchases or different halves of it" — the
    feature-selection question MI alone cannot split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_MOVES = """
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
               AS p,
             ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
               AS c,
             ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6)
               AS v
      FROM events GROUP BY 1
    ),
    moves AS (
      SELECT CASE WHEN p > LAG(p) OVER (ORDER BY d) THEN 1 ELSE 0 END AS x1,
             CASE WHEN c > LAG(c) OVER (ORDER BY d) THEN 1 ELSE 0 END AS x2,
             CASE WHEN v > LAG(v) OVER (ORDER BY d) THEN 1 ELSE 0 END AS x3,
             LAG(p) OVER (ORDER BY d) AS _l
      FROM daily WHERE p IS NOT NULL AND c IS NOT NULL AND v IS NOT NULL
    ),
    obs AS (SELECT x1, x2, x3 FROM moves WHERE _l IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM obs)
"""


_OINFO_SQL = f"""
    WITH {_MOVES},
    j3 AS (
      SELECT x1, x2, x3, COUNT(*) / (SELECT n FROM n) AS p
      FROM obs GROUP BY x1, x2, x3
    ),
    h3 AS (SELECT -SUM(p * LN(p)) AS h FROM j3 WHERE p > 0),
    h1 AS (
      SELECT (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x1) WHERE p > 0)
           + (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x2) WHERE p > 0)
           + (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x3) WHERE p > 0) AS h
    ),
    h2 AS (
      SELECT (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x1, x2) WHERE p > 0)
           + (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x1, x3) WHERE p > 0)
           + (SELECT -SUM(p * LN(p)) FROM
               (SELECT SUM(p) AS p FROM j3 GROUP BY x2, x3) WHERE p > 0) AS h
    )
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
           ROUND((SELECT h FROM h1) - (SELECT h FROM h3), 6) AS total_corr,
           ROUND((SELECT h FROM h2) - 2 * (SELECT h FROM h3), 6)
             AS dual_total_corr,
           ROUND(((SELECT h FROM h1) - (SELECT h FROM h3))
                 - ((SELECT h FROM h2) - 2 * (SELECT h FROM h3)), 6)
             AS o_information
"""


def _moves_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("p"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
        ).alias("c"),
        F.round(
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 6
        ).alias("v"),
    ).where(
        F.col("p").isNotNull() & F.col("c").isNotNull() & F.col("v").isNotNull()
    )
    wd = Window.orderBy("d")
    moves = daily.select(
        F.when(F.col("p") > F.lag("p").over(wd), 1).otherwise(0).alias("x1"),
        F.when(F.col("c") > F.lag("c").over(wd), 1).otherwise(0).alias("x2"),
        F.when(F.col("v") > F.lag("v").over(wd), 1).otherwise(0).alias("x3"),
        F.lag("p").over(wd).alias("_l"),
    )
    return moves.where(F.col("_l").isNotNull()).select("x1", "x2", "x3")


def _ent(j3: DataFrame, *cols: str) -> DataFrame:
    g = j3.groupBy(*cols).agg(F.sum("p").alias("p"))
    return g.where(F.col("p") > 0).agg(
        (-F.sum(F.col("p") * F.log("p"))).alias("h")
    )


@register("o_information_events", _OINFO_SQL)
def o_information_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _moves_frame(spark, sf_dir)
    n = obs.count()
    j3 = obs.groupBy("x1", "x2", "x3").agg(
        (F.count("*") / F.lit(float(n))).alias("p")
    )
    h3 = _ent(j3, "x1", "x2", "x3").select(F.col("h").alias("h3"))
    h1 = (
        _ent(j3, "x1")
        .crossJoin(_ent(j3, "x2").select(F.col("h").alias("hb")))
        .crossJoin(_ent(j3, "x3").select(F.col("h").alias("hc")))
        .select((F.col("h") + F.col("hb") + F.col("hc")).alias("h1"))
    )
    h2 = (
        _ent(j3, "x1", "x2")
        .crossJoin(_ent(j3, "x1", "x3").select(F.col("h").alias("hb")))
        .crossJoin(_ent(j3, "x2", "x3").select(F.col("h").alias("hc")))
        .select((F.col("h") + F.col("hb") + F.col("hc")).alias("h2"))
    )
    return (
        h1.crossJoin(F.broadcast(h2))
        .crossJoin(F.broadcast(h3))
        .select(
            F.lit(n).cast("long").alias("n"),
            F.round(F.col("h1") - F.col("h3"), 6).alias("total_corr"),
            F.round(F.col("h2") - 2 * F.col("h3"), 6).alias(
                "dual_total_corr"
            ),
            F.round(
                (F.col("h1") - F.col("h3"))
                - (F.col("h2") - 2 * F.col("h3")),
                6,
            ).alias("o_information"),
        )
    )


_PID_SQL = f"""
    WITH {_MOVES},
    jt AS (
      SELECT x1 AS t, x2 AS s1, x3 AS s2,
             COUNT(*) / (SELECT n FROM n) AS p
      FROM obs GROUP BY x1, x2, x3
    ),
    pt AS (SELECT t, SUM(p) AS pt FROM jt GROUP BY t),
    ps1 AS (SELECT s1, SUM(p) AS ps FROM jt GROUP BY s1),
    ps2 AS (SELECT s2, SUM(p) AS ps FROM jt GROUP BY s2),
    jts1 AS (SELECT t, s1, SUM(p) AS p FROM jt GROUP BY t, s1),
    jts2 AS (SELECT t, s2, SUM(p) AS p FROM jt GROUP BY t, s2),
    spec1 AS (
      SELECT j.t,
             SUM((j.p / pt.pt)
                 * LN((j.p / ps1.ps) / pt.pt)) AS i_spec
      FROM jts1 j JOIN pt ON pt.t = j.t JOIN ps1 ON ps1.s1 = j.s1
      WHERE j.p > 0
      GROUP BY j.t
    ),
    spec2 AS (
      SELECT j.t,
             SUM((j.p / pt.pt)
                 * LN((j.p / ps2.ps) / pt.pt)) AS i_spec
      FROM jts2 j JOIN pt ON pt.t = j.t JOIN ps2 ON ps2.s2 = j.s2
      WHERE j.p > 0
      GROUP BY j.t
    ),
    red AS (
      SELECT SUM(pt.pt * LEAST(s1.i_spec, s2.i_spec)) AS r
      FROM pt JOIN spec1 s1 ON s1.t = pt.t JOIN spec2 s2 ON s2.t = pt.t
    ),
    mi1 AS (
      SELECT SUM(j.p * LN(j.p / (pt.pt * ps1.ps))) AS i
      FROM jts1 j JOIN pt ON pt.t = j.t JOIN ps1 ON ps1.s1 = j.s1
      WHERE j.p > 0
    ),
    mi2 AS (
      SELECT SUM(j.p * LN(j.p / (pt.pt * ps2.ps))) AS i
      FROM jts2 j JOIN pt ON pt.t = j.t JOIN ps2 ON ps2.s2 = j.s2
      WHERE j.p > 0
    ),
    ps12 AS (SELECT s1, s2, SUM(p) AS ps FROM jt GROUP BY s1, s2),
    mi12 AS (
      SELECT SUM(j.p * LN(j.p / (pt.pt * ps12.ps))) AS i
      FROM jt j JOIN pt ON pt.t = j.t
      JOIN ps12 ON ps12.s1 = j.s1 AND ps12.s2 = j.s2
      WHERE j.p > 0
    )
    SELECT ROUND((SELECT i FROM mi12), 6) AS mi_joint,
           ROUND((SELECT r FROM red), 6) AS redundancy,
           ROUND((SELECT i FROM mi1) - (SELECT r FROM red), 6) + 0 AS unique_s1,
           ROUND((SELECT i FROM mi2) - (SELECT r FROM red), 6) + 0 AS unique_s2,
           ROUND((SELECT i FROM mi12) - (SELECT i FROM mi1)
                 - (SELECT i FROM mi2) + (SELECT r FROM red), 6) + 0
             AS synergy
"""


@register("pid_events", _PID_SQL)
def pid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _moves_frame(spark, sf_dir)
    n = obs.count()
    jt = obs.groupBy(
        F.col("x1").alias("t"), F.col("x2").alias("s1"), F.col("x3").alias("s2")
    ).agg((F.count("*") / F.lit(float(n))).alias("p"))
    pt = jt.groupBy("t").agg(F.sum("p").alias("pt"))
    ps1 = jt.groupBy("s1").agg(F.sum("p").alias("ps1"))
    ps2 = jt.groupBy("s2").agg(F.sum("p").alias("ps2"))
    jts1 = jt.groupBy("t", "s1").agg(F.sum("p").alias("p"))
    jts2 = jt.groupBy("t", "s2").agg(F.sum("p").alias("p"))

    def spec(jts, psx, skey, psname):
        return (
            jts.join(F.broadcast(pt), "t")
            .join(F.broadcast(psx), skey)
            .where(F.col("p") > 0)
            .groupBy("t")
            .agg(
                F.sum(
                    (F.col("p") / F.col("pt"))
                    * F.log((F.col("p") / F.col(psname)) / F.col("pt"))
                ).alias("i_spec")
            )
        )

    spec1 = spec(jts1, ps1, "s1", "ps1").select(
        "t", F.col("i_spec").alias("i1")
    )
    spec2 = spec(jts2, ps2, "s2", "ps2").select(
        "t", F.col("i_spec").alias("i2")
    )
    red = (
        pt.join(spec1, "t")
        .join(spec2, "t")
        .agg(
            F.sum(F.col("pt") * F.least("i1", "i2")).alias("r")
        )
    )

    def mi(jts, psx, skey, psname):
        return (
            jts.join(F.broadcast(pt), "t")
            .join(F.broadcast(psx), skey)
            .where(F.col("p") > 0)
            .agg(
                F.sum(
                    F.col("p")
                    * F.log(F.col("p") / (F.col("pt") * F.col(psname)))
                ).alias("i")
            )
        )

    mi1 = mi(jts1, ps1, "s1", "ps1").select(F.col("i").alias("i1"))
    mi2 = mi(jts2, ps2, "s2", "ps2").select(F.col("i").alias("i2"))
    ps12 = jt.groupBy("s1", "s2").agg(F.sum("p").alias("ps12"))
    mi12 = (
        jt.join(F.broadcast(pt), "t")
        .join(F.broadcast(ps12), ["s1", "s2"])
        .where(F.col("p") > 0)
        .agg(
            F.sum(
                F.col("p") * F.log(F.col("p") / (F.col("pt") * F.col("ps12")))
            ).alias("i12")
        )
    )
    return (
        mi12.crossJoin(F.broadcast(red))
        .crossJoin(F.broadcast(mi1))
        .crossJoin(F.broadcast(mi2))
        .select(
            F.round("i12", 6).alias("mi_joint"),
            F.round("r", 6).alias("redundancy"),
            (F.round(F.col("i1") - F.col("r"), 6) + 0).alias("unique_s1"),
            (F.round(F.col("i2") - F.col("r"), 6) + 0).alias("unique_s2"),
            (
                F.round(
                    F.col("i12") - F.col("i1") - F.col("i2") + F.col("r"), 6
                )
                + 0
            ).alias("synergy"),
        )
    )
