"""Stream-stream join: user turn → assistant response pairing.

Not in the reference (LNEx has no notion of conversational structure);
this is the transcripts-payload operator the Structured Streaming
stream-stream join class maps onto naturally: pair each user turn with
the assistant turn that answers it (turn_idx + 1, same conversation)
and emit the response latency.

Semantics & scale:

* the join keys are equi (conv_id, turn_idx+1 = turn_idx) so state is
  hash-partitioned by conversation — same key layout as every other
  stage of the engine;
* BOTH sides carry watermarks and the join condition bounds assistant
  event-time to [user.ts, user.ts + max_lag], so each side's join
  state is evicted once the watermark passes — without the time bound
  a stream-stream inner join buffers unboundedly;
* the same function runs on batch DataFrames (watermarks are only
  attached when the input is streaming), which is how the stream ≡
  batch test and the DuckDB oracle check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def response_latency_join(
    turns: DataFrame,
    watermark: str = "10 minutes",
    max_lag_seconds: int = 3600,
) -> DataFrame:
    """Pair user turns with their immediate assistant responses.

    ``turns`` is a (streaming or batch) transcripts DataFrame;
    returns ``(conv_id, user_turn, assistant_turn, latency_sec)``.
    """

    def _wm(df: DataFrame, ts_col: str) -> DataFrame:
        return df.withWatermark(ts_col, watermark) if df.isStreaming else df

    users = _wm(
        turns.where(F.col("role") == "user").select(
            F.col("conv_id").alias("u_conv"),
            F.col("turn_idx").alias("user_turn"),
            F.col("ts").alias("u_ts"),
        ),
        "u_ts",
    )
    assistants = _wm(
        turns.where(F.col("role") == "assistant").select(
            F.col("conv_id").alias("a_conv"),
            F.col("turn_idx").alias("assistant_turn"),
            F.col("ts").alias("a_ts"),
        ),
        "a_ts",
    )
    cond = (
        (F.col("u_conv") == F.col("a_conv"))
        & (F.col("assistant_turn") == F.col("user_turn") + 1)
        & (F.col("a_ts") >= F.col("u_ts"))
        & (F.col("a_ts") <= F.col("u_ts") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )
    return users.join(assistants, cond).select(
        F.col("u_conv").alias("conv_id"),
        "user_turn",
        "assistant_turn",
        (F.unix_timestamp("a_ts") - F.unix_timestamp("u_ts")).alias("latency_sec"),
    )
