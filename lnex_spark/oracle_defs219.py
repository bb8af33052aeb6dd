"""Two-hundred-nineteenth oracle-registry module: transposition-aware
edit distance — the last member of the string-matching family, with
GENUINELY INDEPENDENT implementations on the two engines (the
oracle_defs130 discipline).

  * damerau_levenshtein_parts — UNRESTRICTED Damerau-Levenshtein
    distance between adjacent part names (p_partkey % 20 = 0 paired
    with +1): a vectorized Arrow pandas UDF implementing the full
    alphabet-bookkeeping dynamic program (transpositions may move:
    probed empirically — DuckDB gives DL('ca','abc') = 2 where the
    common OSA variant gives 3) vs DuckDB's NATIVE
    damerau_levenshtein on the oracle side.  Also
    emits plain Levenshtein (both engines' natives) and the
    transposition saving lev - dl — nonzero exactly where swapped
    adjacent characters ("hte" for "the") were being double-counted;
    the right distance for keyboard typos in location names, where
    transposition is the single most common error.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dl(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (transpositions may move),
    matching DuckDB's native damerau_levenshtein — verified on the
    classic OSA-vs-DL case ('ca','abc'): OSA 3, DL 2."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _dl_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_dl(x or "", y or "") for x, y in zip(a, b)], dtype="int64"
    )


_DL_SQL = """
    WITH pairs AS (
      SELECT a.p_partkey AS k, a.p_name AS na, b.p_name AS nb
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      WHERE a.p_partkey % 20 = 0
    )
    SELECT k AS p_partkey,
           CAST(damerau_levenshtein(na, nb) AS BIGINT) AS dl,
           CAST(levenshtein(na, nb) AS BIGINT) AS lev,
           CAST(levenshtein(na, nb) - damerau_levenshtein(na, nb)
                AS BIGINT) AS transposition_saving
    FROM pairs
    ORDER BY p_partkey
"""


@register("damerau_levenshtein_parts", _DL_SQL)
def damerau_levenshtein_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.where(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("na")
    )
    b = p.select(F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"))
    pairs = a.join(b, F.col("kb") == F.col("k") + 1).select("k", "na", "nb")
    dl_udf = F.pandas_udf(_dl_batch, LongType())
    return (
        pairs.withColumn("dl", dl_udf("na", "nb"))
        .withColumn("lev", F.levenshtein("na", "nb").cast("long"))
        .select(
            F.col("k").alias("p_partkey"),
            "dl",
            "lev",
            (F.col("lev") - F.col("dl")).alias("transposition_saving"),
        )
        .orderBy("p_partkey")
    )
