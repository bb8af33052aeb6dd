"""Two-hundred-second oracle-registry module: conjugate hierarchical
count models — the Gamma-Poisson and Beta-Binomial method-of-moments
layers that turn raw per-user counts into defensible rates.

  * gamma_poisson_eb_events — empirical-Bayes shrinkage of per-user
    DAILY event rates under a Gamma prior fit by method of moments
    across users (exposure = each user's active-day span): prior
    alpha/beta from the across-user rate mean/variance (variance
    with the Poisson sampling component REMOVED — the standard MoM
    correction E[s2] = mu_rate * E[1/T] + var_rate), posterior per
    user (alpha + n_u)/(beta + T_u).  Emits the prior, the
    shrinkage summary, and the max raw-vs-posterior rate — the
    leaderboard fix for "user with 2 events in 1 day tops the rate
    chart"; the count-data twin of eb_shrinkage_users /
    buhlmann_credibility_events.

  * beta_binomial_events — overdispersion of per-user success
    shares (success = value > 50): method-of-moments intra-class
    correlation rho_hat = (s2_p - pbar(1-pbar) E[1/n]) /
    (pbar(1-pbar)(1 - E[1/n])), mapped to Beta(a, b) via
    M = 1/rho - 1, plus the design-effect 1 + (nbar - 1) rho that
    deflates any pooled z-test on these shares.  rho > 0 here means
    users differ intrinsically — pooling their trials as one
    binomial (ab_test_events style) overstates evidence by exactly
    this factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_GP_SQL = """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n,
             GREATEST(date_diff('day',
               CAST(date_trunc('day', MIN(ts)) AS DATE),
               CAST(date_trunc('day', MAX(ts)) AS DATE)) + 1, 1) AS t
      FROM events GROUP BY user_id
    ),
    rates AS (
      SELECT user_id, n, CAST(t AS DOUBLE) AS t,
             CAST(n AS DOUBLE) / t AS r
      FROM per_user
    ),
    mom AS (
      SELECT COUNT(*) AS k, AVG(r) AS mu,
             (SUM(r * r) - COUNT(*) * AVG(r) * AVG(r)) / (COUNT(*) - 1)
               AS s2,
             AVG(1 / t) AS einvt
      FROM rates
    ),
    prior AS (
      SELECT k, mu,
             GREATEST(s2 - mu * einvt, 1e-9) AS tau2,
             mu / GREATEST(s2 - mu * einvt, 1e-9) AS beta,
             mu * mu / GREATEST(s2 - mu * einvt, 1e-9) AS alpha
      FROM mom
    ),
    post AS (
      SELECT r.user_id, r.r,
             (p.alpha + r.n) / (p.beta + r.t) AS pm
      FROM rates r CROSS JOIN prior p
    )
    SELECT CAST((SELECT k FROM prior) AS BIGINT) AS n_users,
           -- log10 scale, not round(x, 6): alpha/beta = mu^2/tau2 where
           -- tau2 is a near-cancelling difference — the quotient spans
           -- ~0.2 (sf0.01) to ~5e9 (sf0.1), so no fixed decimal scale is
           -- both meaningful and ulp-stable; log10 turns 1e-15-relative
           -- engine noise into 1e-15 ABSOLUTE, safe at 6 decimals forever
           ROUND(LOG10((SELECT alpha FROM prior)), 6) AS prior_alpha_log10,
           ROUND(LOG10((SELECT beta FROM prior)), 6) AS prior_beta_log10,
           ROUND((SELECT mu FROM prior), 6) AS mean_rate,
           ROUND(MAX(r), 6) AS max_raw_rate,
           ROUND(MAX(pm), 6) AS max_posterior_rate,
           ROUND(AVG(ABS(r - pm)), 6) AS mean_shrinkage
    FROM post
"""


@register("gamma_poisson_eb_events", _GP_SQL)
def gamma_poisson_eb_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.greatest(
            F.datediff(
                F.date_trunc("day", F.max("ts")).cast("date"),
                F.date_trunc("day", F.min("ts")).cast("date"),
            )
            + 1,
            F.lit(1),
        ).alias("t"),
    )
    rates = per_user.select(
        "user_id",
        "n",
        F.col("t").cast("double").alias("t"),
        (F.col("n").cast("double") / F.col("t")).alias("r"),
    )
    mom = rates.agg(
        F.count("*").alias("k"),
        F.avg("r").alias("mu"),
        (
            (F.sum(F.col("r") * F.col("r")) - F.count("*") * F.avg("r") * F.avg("r"))
            / (F.count("*") - 1)
        ).alias("s2"),
        F.avg(1 / F.col("t")).alias("einvt"),
    )
    tau2 = F.greatest(
        F.col("s2") - F.col("mu") * F.col("einvt"), F.lit(1e-9)
    )
    prior = mom.select(
        "k",
        "mu",
        (F.col("mu") / tau2).alias("beta"),
        (F.col("mu") * F.col("mu") / tau2).alias("alpha"),
    )
    post = rates.crossJoin(F.broadcast(prior)).select(
        "r",
        "k",
        "mu",
        "alpha",
        "beta",
        (
            (F.col("alpha") + F.col("n")) / (F.col("beta") + F.col("t"))
        ).alias("pm"),
    )
    return post.agg(
        F.max("k").cast("long").alias("n_users"),
        # log10 form — see the SQL comment
        F.round(F.log10(F.max("alpha")), 6).alias("prior_alpha_log10"),
        F.round(F.log10(F.max("beta")), 6).alias("prior_beta_log10"),
        F.round(F.max("mu"), 6).alias("mean_rate"),
        F.round(F.max("r"), 6).alias("max_raw_rate"),
        F.round(F.max("pm"), 6).alias("max_posterior_rate"),
        F.round(F.avg(F.abs(F.col("r") - F.col("pm"))), 6).alias(
            "mean_shrinkage"
        ),
    )


_BB_SQL = """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id
      HAVING COUNT(*) >= 2
    ),
    shares AS (
      SELECT CAST(s AS DOUBLE) / n AS p, CAST(n AS DOUBLE) AS n
      FROM per_user
    ),
    mom AS (
      SELECT COUNT(*) AS k, AVG(p) AS pbar,
             (SUM(p * p) - COUNT(*) * AVG(p) * AVG(p)) / (COUNT(*) - 1)
               AS s2p,
             AVG(1 / n) AS einv, AVG(n) AS nbar
      FROM shares
    )
    SELECT CAST(k AS BIGINT) AS n_users,
           ROUND(pbar, 6) AS pbar,
           ROUND(s2p, 6) AS var_shares,
           ROUND((s2p - pbar * (1 - pbar) * einv)
                 / (pbar * (1 - pbar) * (1 - einv)), 6) AS rho_icc,
           ROUND(1 + (nbar - 1)
                 * GREATEST((s2p - pbar * (1 - pbar) * einv)
                            / (pbar * (1 - pbar) * (1 - einv)), 0), 6)
             AS design_effect
    FROM mom
"""


@register("beta_binomial_events", _BB_SQL)
def beta_binomial_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("s"),
        )
        .where(F.col("n") >= 2)
    )
    shares = per_user.select(
        (F.col("s").cast("double") / F.col("n")).alias("p"),
        F.col("n").cast("double").alias("n"),
    )
    mom = shares.agg(
        F.count("*").alias("k"),
        F.avg("p").alias("pbar"),
        (
            (F.sum(F.col("p") * F.col("p")) - F.count("*") * F.avg("p") * F.avg("p"))
            / (F.count("*") - 1)
        ).alias("s2p"),
        F.avg(1 / F.col("n")).alias("einv"),
        F.avg("n").alias("nbar"),
    )
    rho = (
        F.col("s2p") - F.col("pbar") * (1 - F.col("pbar")) * F.col("einv")
    ) / (F.col("pbar") * (1 - F.col("pbar")) * (1 - F.col("einv")))
    return mom.select(
        F.col("k").cast("long").alias("n_users"),
        F.round("pbar", 6).alias("pbar"),
        F.round("s2p", 6).alias("var_shares"),
        F.round(rho, 6).alias("rho_icc"),
        F.round(
            1 + (F.col("nbar") - 1) * F.greatest(rho, F.lit(0.0)), 6
        ).alias("design_effect"),
    )
