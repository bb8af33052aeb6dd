"""Remaining Python-UDF surfaces: an Arrow-optimized Python UDTF and
a grouped-aggregate (vectorized UDAF-style) pandas UDF.

SURVEY §2B concluded the KG flagship itself needs no UDTF/UDAF
(`explode` covers table-generation, min_by/max_by cover top-1-per-
group) — these exist so the engine covers the full UDF surface a
training-data pipeline might reach for, each SQL-verified:

* ``shingle_udtf`` — SQL-callable table function emitting (pos,
  shingle) bigram rows per document, used via ``LATERAL``; the
  relational twin of operators/dedup.shingles. Arrow-optimized
  (``useArrow=True``) so batches cross the JVM↔Python boundary
  columnar, same as every other Python island in this engine.
* ``gmean_udf`` — grouped-agg pandas UDF (one Arrow batch per group
  → scalar), the vectorized replacement for a row-at-a-time UDAF;
  oracle: exp(avg(ln(x))).

Tokenization matches the dedup/shingle convention exactly
(lower, trim, split on whitespace runs) so oracles line up.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf

_WS = re.compile(r"\s+")


@udtf(returnType="pos int, shingle string", useArrow=True)
class shingle_udtf:  # noqa: N801 — SQL-facing name
    """LATERAL shingle_udtf(text) → one row per bigram shingle."""

    def eval(self, text: str):
        if text is None:
            return
        toks = _WS.split(text.lower().strip())
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


@pandas_udf("double")
def gmean_udf(v: pd.Series) -> float:
    """Geometric mean of a (positive) value column, one group per call."""
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


def register_udtfs(spark) -> None:
    """Make the table function available to SQL (idempotent)."""
    spark.udtf.register("shingle_udtf", shingle_udtf)
