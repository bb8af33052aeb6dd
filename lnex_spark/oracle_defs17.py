"""Seventeenth oracle-registry module: the two Python-execution API
surfaces not yet exercised anywhere in the engine, each value-hash
verified against a pure-SQL DuckDB re-derivation (the same standard as
every other imperative island — see oracle_defs2's docstring):

  * cogroup_user_activity — ``groupBy().cogroup().applyInPandas``:
    the cogrouped-pandas join surface. Both sides shuffle once on the
    group key and arrive as per-key pandas frames — the API a custom
    two-sided stateful merge (e.g., reconciling two event feeds per
    user) uses when the relational form would need several joins.
    Semantics here are deliberately SQL-expressible (clicks before
    each user's first error) so the island is value-checked, not
    rows-only.
  * quantize_embeddings — ``DataFrame.mapInArrow``: the Arrow-native
    batch surface (no pandas conversion at all; pyarrow RecordBatch
    in/out, numpy on the flattened value buffers). Implements int8
    affine vector quantization — the storage-side companion of the
    ANN ops: scale = 127/max|x| per vector, q = floor(x*scale + 0.5).
    Rounding is written as floor(x+0.5) in BOTH engines so no
    half-even vs half-away divergence can appear; float32→float64
    promotion is exact on both sides.

At 100 TB both islands stay healthy: cogroup is one co-partitioned
shuffle of each side (same cost model as a sort-merge join);
mapInArrow is embarrassingly parallel over scan partitions with zero
shuffle and zero pandas materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- cogrouped applyInPandas: two event feeds merged per user --------------
def _merge_clicks_errors(clicks, errors):
    import pandas as pd

    n_clicks = len(clicks)
    n_errors = len(errors)
    if n_clicks:
        uid = clicks["user_id"].iloc[0]
    else:
        uid = errors["user_id"].iloc[0]
    first_err = errors["ts"].min() if n_errors else pd.NaT
    if n_errors and n_clicks:
        before = int((clicks["ts"] < first_err).sum())
    else:
        before = 0
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_clicks": [n_clicks],
            "n_errors": [n_errors],
            "clicks_before_first_error": [before],
        }
    )


@register(
    "cogroup_user_activity",
    """
    WITH clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    errors AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
    ),
    users AS (
      SELECT user_id FROM clicks UNION SELECT user_id FROM errors
    ),
    fe AS (SELECT user_id, min(ts) AS first_err FROM errors GROUP BY user_id)
    SELECT u.user_id,
           cast(coalesce((SELECT count(*) FROM clicks c WHERE c.user_id = u.user_id), 0) AS INT) AS n_clicks,
           cast(coalesce((SELECT count(*) FROM errors e WHERE e.user_id = u.user_id), 0) AS INT) AS n_errors,
           cast(coalesce((SELECT count(*) FROM clicks c
                          WHERE c.user_id = u.user_id
                            AND c.ts < (SELECT first_err FROM fe WHERE fe.user_id = u.user_id)), 0) AS INT)
             AS clicks_before_first_error
    FROM users u
    """,
)
def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts")
    return (
        clicks.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(
            _merge_clicks_errors,
            "user_id bigint, n_clicks int, n_errors int, clicks_before_first_error int",
        )
    )


# --- mapInArrow: int8 affine vector quantization ---------------------------
def _quantize_batches(batches: Iterator) -> Iterator:
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        vid = batch.column("vec_id")
        emb = batch.column("embedding")
        # flattened float32 value buffer + offsets: no per-row Python
        offsets = emb.offsets.to_numpy()
        vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(vid)
        maxabs = np.zeros(n)
        scales = np.zeros(n)
        qvals = np.zeros(len(vals), dtype=np.int32)
        absvals = np.abs(vals)
        for i in range(n):
            lo, hi = offsets[i], offsets[i + 1]
            m = absvals[lo:hi].max() if hi > lo else 0.0
            maxabs[i] = m
            s = 127.0 / m if m > 0 else 0.0
            scales[i] = s
            qvals[lo:hi] = np.floor(vals[lo:hi] * s + 0.5).astype(np.int32)
        qlist = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(qvals))
        yield pa.RecordBatch.from_arrays(
            [vid, qlist, pa.array(np.round(scales, 6))],
            ["vec_id", "qvec", "scale"],
        )


@register(
    "quantize_embeddings",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             cast(coalesce(list_max(list_transform(embedding, x -> abs(x))), 0)
                  AS DOUBLE) AS maxabs
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding,
             CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS sc
      FROM m
    )
    SELECT vec_id,
           list_transform(embedding, x -> cast(floor(cast(x AS DOUBLE) * sc + 0.5) AS INT)) AS qvec,
           round(sc, 6) AS scale
    FROM s
    """,
)
def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.mapInArrow(
        _quantize_batches, "vec_id bigint, qvec array<int>, scale double"
    )
