"""Hundred-ninety-ninth oracle-registry module: diversity structure
of the token "ecosystem" — the exact subsample-diversity curve and
the abundance spectrum, the two views Chao1 / Heaps summarize away.

  * rarefaction_docs — EXACT hypergeometric rarefaction: expected
    distinct token types in a uniform subsample of m tokens,
    E[S_m] = sum_i (1 - C(N - N_i, m) / C(N, m)), with the
    binomial ratio computed per type as exp(sum_{{j<N_i}}
    ln((N - m - j)/(N - j))) — the per-type explode totals exactly N
    rows, so the job is corpus-sized, not combinatorial.  Evaluated
    at m = 10%, 25%, 50%, 75% of N: the fair way to compare
    vocabulary richness across corpora of different sizes (heaps_law
    fits growth; this is the exact finite-sample answer).

  * abundance_octaves_docs — Preston's log2 abundance octaves:
    types binned by floor(log2(count)), with type counts, token
    mass, and cumulative type share per octave.  Log-normal-ish
    communities show the famous veiled bell; Zipfian corpora
    decay monotonically — the one-glance diagnostic of which
    regime the vocabulary is in (cross-check: zipf_slope_docs,
    good_turing_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_RAREFACTION_SQL = """
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    types AS (
      SELECT tok, COUNT(*) AS ni FROM toks WHERE tok <> '' GROUP BY tok
    ),
    nn AS (SELECT SUM(ni) AS n, COUNT(*) AS s FROM types),
    ms AS (
      SELECT CAST(FLOOR(f * (SELECT n FROM nn)) AS BIGINT) AS m,
             f
      FROM (SELECT CAST(UNNEST([0.1, 0.25, 0.5, 0.75]) AS DOUBLE) AS f)
    ),
    expanded AS (
      SELECT t.tok, t.ni, m.m, m.f, j.j
      FROM types t CROSS JOIN ms m
      JOIN (SELECT UNNEST(range(0, (SELECT MAX(ni) FROM types))) AS j) j
        ON j.j < t.ni
      WHERE t.ni <= (SELECT n FROM nn) - m.m
    ),
    lnratio AS (
      SELECT tok, ni, m, f,
             SUM(LN(CAST((SELECT n FROM nn) - m - j AS DOUBLE)
                    / ((SELECT n FROM nn) - j))) AS lr
      FROM expanded GROUP BY tok, ni, m, f
    ),
    absent AS (
      SELECT m, f, SUM(EXP(lr)) AS p_absent_sum
      FROM lnratio GROUP BY m, f
    )
    SELECT a.f AS fraction, a.m AS subsample_tokens,
           CAST((SELECT s FROM nn) AS BIGINT) AS total_types,
           ROUND((SELECT s FROM nn) - a.p_absent_sum, 4) AS expected_types
    FROM absent a
    ORDER BY fraction
"""


@register("rarefaction_docs", _RAREFACTION_SQL)
def rarefaction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    types = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("ni"))
    )
    nn = types.agg(F.sum("ni").alias("n"), F.count("*").alias("s"))
    row = nn.collect()[0]
    n_total, s_total = int(row["n"]), int(row["s"])
    ms = d.sparkSession.createDataFrame(
        [(f, int(f * n_total)) for f in (0.1, 0.25, 0.5, 0.75)],
        "f double, m long",
    )
    maxni = int(types.agg(F.max("ni")).collect()[0][0])
    js = d.sparkSession.range(0, maxni).select(F.col("id").alias("j"))
    expanded = (
        types.crossJoin(F.broadcast(ms))
        .where(F.col("ni") <= n_total - F.col("m"))
        .join(js, F.col("j") < F.col("ni"))
    )
    lnratio = expanded.groupBy("tok", "ni", "m", "f").agg(
        F.sum(
            F.log(
                (F.lit(n_total) - F.col("m") - F.col("j")).cast("double")
                / (F.lit(n_total) - F.col("j"))
            )
        ).alias("lr")
    )
    absent = lnratio.groupBy("m", "f").agg(
        F.sum(F.exp("lr")).alias("p_absent_sum")
    )
    return absent.select(
        F.col("f").alias("fraction"),
        F.col("m").alias("subsample_tokens"),
        F.lit(s_total).cast("long").alias("total_types"),
        F.round(F.lit(s_total) - F.col("p_absent_sum"), 4).alias(
            "expected_types"
        ),
    ).orderBy("fraction")


_OCTAVES_SQL = """
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    types AS (
      SELECT tok, COUNT(*) AS ni FROM toks WHERE tok <> '' GROUP BY tok
    ),
    oct AS (
      SELECT CAST(FLOOR(LN(ni) / LN(2)) AS BIGINT) AS octave,
             COUNT(*) AS n_types, SUM(ni) AS token_mass
      FROM types GROUP BY 1
    ),
    tot AS (SELECT SUM(n_types) AS st FROM oct)
    SELECT octave,
           CAST(POW(2, octave) AS BIGINT) AS min_count,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(token_mass AS BIGINT) AS token_mass,
           ROUND(SUM(CAST(n_types AS DOUBLE)) OVER (ORDER BY octave)
                 / (SELECT st FROM tot), 6) AS cum_type_share
    FROM oct
    ORDER BY octave
"""


@register("abundance_octaves_docs", _OCTAVES_SQL)
def abundance_octaves_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    types = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("ni"))
    )
    oct_ = types.groupBy(
        F.floor(F.log("ni") / F.log(F.lit(2.0))).cast("long").alias("octave")
    ).agg(
        F.count("*").alias("n_types"), F.sum("ni").alias("token_mass")
    )
    tot = oct_.agg(F.sum("n_types").alias("st"))
    wc = Window.orderBy("octave").rowsBetween(Window.unboundedPreceding, 0)
    return (
        oct_.crossJoin(F.broadcast(tot))
        .select(
            "octave",
            F.pow(F.lit(2.0), F.col("octave")).cast("long").alias("min_count"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("token_mass").cast("long").alias("token_mass"),
            F.round(
                F.sum(F.col("n_types").cast("double")).over(wc) / F.col("st"),
                6,
            ).alias("cum_type_share"),
        )
        .orderBy("octave")
    )
