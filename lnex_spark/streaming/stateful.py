"""Custom stateful streaming operator: per-conversation first-mention
detection via ``applyInPandasWithState``.

Semantics: over a (possibly unbounded) stream of extracted mentions,
flag each (conv_id, norm) pair's FIRST occurrence — "is this location
new to this conversation, or a repeat?". Downstream KG use: only
first mentions create new candidate edges; repeats only bump weights.

State design (the part Spark can't express relationally on a stream):
  * keyed by conv_id; state = the set of norms already seen in that
    conversation (bounded by the gazetteer's distinct-name count, so
    state size is capped regardless of conversation length);
  * within a micro-batch the rows are processed in (turn_idx, start)
    order so replays and batch/stream parity are deterministic;
  * a processing-time timeout (default 1h) expires idle conversations
    — the long-tail skew story again: without expiry the hot
    conversation's state would live forever.

Batch equivalence: ``first_mention_flags`` — one ranking window. The
stream≡batch property is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_MENTION_SCHEMA = (
    "conv_id string, turn_idx int, start int, norm string, is_first boolean"
)
_STATE_SCHEMA = "seen array<string>"


def _flag_first(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["turn_idx", "start"], kind="mergesort")
        flags = []
        for norm in pdf["norm"].values:
            if norm in seen:
                flags.append(False)
            else:
                seen.add(norm)
                flags.append(True)
        out.append(
            pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].values,
                    "start": pdf["start"].values,
                    "norm": pdf["norm"].values,
                    "is_first": pd.Series(flags, dtype="bool"),
                }
            )
        )
    state.update((sorted(seen),))
    state.setTimeoutDuration(3600 * 1000)
    for o in out:
        yield o


def stream_first_mentions(mentions: DataFrame) -> DataFrame:
    """mentions stream (conv_id, turn_idx, start, ..., norm) →
    (conv_id, turn_idx, start, norm, is_first) with per-conversation
    dedup state. Works on both streaming and batch DataFrames (batch
    runs one "micro-batch" per group with empty initial state)."""
    return (
        mentions.select("conv_id", "turn_idx", "start", "norm")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _flag_first,
            outputStructType=FIRST_MENTION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def first_mention_flags(mentions: DataFrame) -> DataFrame:
    """Batch equivalent: is_first ⟺ rank 1 within (conv_id, norm) by
    (turn_idx, start). One ranking window — the relational form the
    stateful op must agree with on closed data."""
    w = Window.partitionBy("conv_id", "norm").orderBy(
        F.col("turn_idx").asc(), F.col("start").asc()
    )
    return mentions.select(
        "conv_id",
        "turn_idx",
        "start",
        "norm",
        (F.row_number().over(w) == 1).alias("is_first"),
    )
