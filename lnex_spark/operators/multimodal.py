"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
``decode_features`` computes deterministic fake features from the raw
bytes when the real decoder is unavailable, and the real path raises
NotImplementedError behind an import-try. Everything Spark-side —
schema, batch shape, partitioning, UDF signatures — is real and
tested; swapping in PIL/librosa later only changes the inner function.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_md5 string, feature array<double>"
)

_KINDS = ["image", "audio", "video"]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from documents: payload =
    UTF-8 bytes of the text (opaque stand-in), kind/meta keyed off
    doc_id. Pure built-ins."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(640)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            ((F.pmod(F.col("doc_id"), F.lit(300)) + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _real_decode(kind: str, payload: bytes, meta) -> np.ndarray:
    raise NotImplementedError(
        "real media decode requires PIL/librosa/av — not available in this "
        "container; the deterministic fake below exercises the same "
        "plumbing (schema, batching, feature shape)"
    )


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in 'embedding': strided code-point means.

    feature[j] = mean(codepoint of every dim-th character starting at j)
    over the UTF-8-decoded payload, 0.0 for an empty stride.  Chosen to
    be reproducible bit-for-bit in plain SQL (avg over ord(char) grouped
    by position % dim) so the driver's DuckDB oracle can value-check the
    whole decode path, not just row counts.  Unrounded: the mean is a
    ratio of exactly-representable integers, so Spark and the oracle
    compute the identical double.
    """
    if not payload:
        return np.zeros(dim)
    cps = np.fromiter(map(ord, payload.decode("utf-8", errors="replace")), dtype=np.float64)
    return np.array(
        [float(cps[j::dim].mean()) if len(cps) > j else 0.0 for j in range(dim)]
    )


def decode_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batch carries (media_id, kind, payload, meta) → output
    (media_id, kind, n_bytes, payload_md5, feature). Real decoders plug
    into ``_real_decode``; this container uses the deterministic fake.
    payload_md5 digests the raw bytes (oracle-checkable: DuckDB
    ``md5(text)`` hashes the same UTF-8 bytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    feats.append(_real_decode("", b, None).tolist())
                else:
                    feats.append(_fake_features(b).tolist())
                digests.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "payload_md5": digests,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan (which timestamps to decode) — pure
    built-ins; the decode itself is the stubbed step.

    The sequence is guarded: for a clip shorter than ``every_ms``,
    sequence(0, -1) would DESCEND to [0, -1] and emit a bogus frame -1
    (F.sequence infers step -1 when stop < start)."""
    v = media.filter(F.col("kind") == "video")
    n_frames = F.floor(F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    frames = F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return v.select(
        "media_id",
        F.explode(frames).alias("frame_no"),
    ).select("media_id", "frame_no", (F.col("frame_no") * every_ms).alias("ts_ms"))
