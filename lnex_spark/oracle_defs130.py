"""Hundred-thirtieth oracle-registry module: phonetic + edit-distance
string matching, each verified against a GENUINELY INDEPENDENT
implementation (not the usual both-sides-same-formula pattern):

  * jaro_winkler_parts — Jaro-Winkler similarity over adjacent part
    names, computed by a vectorized Arrow pandas UDF on the Spark
    side and by DuckDB's NATIVE ``jaro_winkler_similarity`` on the
    oracle side.  The UDF replicates the standard semantics probed
    empirically against DuckDB before writing (match window
    max(l1,l2)/2−1, half-transpositions, Winkler boost p=0.1 with
    prefix cap 4 applied only when jaro > 0.7) — the record-linkage
    scorer that complements fuzzy_link_brands' levenshtein.

  * soundex_parts — American Soundex codes for every distinct part
    name word: Spark's NATIVE ``F.soundex`` (commons-codec H/W-silent
    rule, verified empirically: ashcraft→A261, pfister→P236,
    honeyman→H555) vs a hand-rolled DuckDB derivation — delete H/W,
    map vowels→0 / consonants→digit via translate, collapse digit
    runs with per-digit regexp_replace (RE2 has no backreferences),
    drop the first letter's own code, strip vowels, pad to 4.  The
    phonetic blocking key for entity resolution.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _jaro_winkler(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i in range(l1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not f2[j] and s1[i] == s2[j]:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = 0
    half_transpositions = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                half_transpositions += 1
            k += 1
    t = half_transpositions // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1.0 - jaro)
    return jaro


def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
    )


_JW_SQL = """
    SELECT a.p_partkey AS key_a,
           b.p_partkey AS key_b,
           ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
"""


@register("jaro_winkler_parts", _JW_SQL)
def jaro_winkler_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType

    # created lazily so Python workers importing this module at unpickle
    # time never touch the UDF-registration path (needs a live session)
    _jw_udf = F.pandas_udf(_jw_batch, DoubleType())
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("na"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("nb"))
    return (
        a.join(b, a.key_a + 1 == b.key_b)
        .select(
            "key_a",
            "key_b",
            F.round(_jw_udf(F.col("na"), F.col("nb")), 6).alias("jw"),
        )
    )


def _collapse_runs(expr: str) -> str:
    for d in "0123456":
        expr = f"regexp_replace({expr}, '{d}{d}+', '{d}', 'g')"
    return expr


_SOUNDEX_SQL = f"""
    WITH words AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
    ),
    ok AS (
      SELECT w, upper(w) AS u FROM words
      WHERE regexp_full_match(w, '[a-z]+')
    ),
    coded AS (
      SELECT w, u,
             {_collapse_runs(
                 "translate(translate(u, 'HW', ''),"
                 " 'BFPVCGJKQSXZDTLMNRAEIOUY',"
                 " '111122222222334556000000')"
             )} AS collapsed
      FROM ok
    ),
    body AS (
      SELECT w, u,
             CASE WHEN substr(u, 1, 1) IN ('H', 'W') THEN collapsed
                  ELSE substr(collapsed, 2) END AS rest
      FROM coded
    )
    SELECT w, substr(substr(u, 1, 1) || replace(rest, '0', '') || '000', 1, 4)
             AS sx
    FROM body
"""


@register("soundex_parts", _SOUNDEX_SQL)
def soundex_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .distinct()
    )
    return words.select("w", F.soundex("w").alias("sx"))
