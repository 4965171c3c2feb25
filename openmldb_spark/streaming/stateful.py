"""Custom stateful streaming operator via applyInPandasWithState.

Emits a feature row PER TURN as it streams in — the true streaming
analog of the request-mode path: running sum/count/lag plus a ts-gap
session id, with per-conversation state carried across micro-batches.

State per conv_id: (last_ts, session_id, run_sum, run_cnt, last_value).
Late/out-of-order rows within a micro-batch are sorted by (ts, turn_idx)
before folding; cross-batch regressions (a row older than state.last_ts)
are emitted with the current state (documented at-least-once semantics —
bound disorder with a watermark upstream).

State is bounded by conversation count, not history length (O(1) per
conv), and expires via GroupStateTimeout.ProcessingTimeTimeout when a
conversation goes quiet — the streaming analog of bounded frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts LONG, session_id LONG, run_sum DOUBLE, " \
    "run_cnt LONG, last_value DOUBLE"

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("session_id", T.LongType()),
    T.StructField("run_sum", T.DoubleType()),
    T.StructField("run_cnt", T.LongType()),
    T.StructField("prev_value", T.DoubleType()),
])


def _fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState,
          gap_ms: int, idle_timeout_ms: int):
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        last_ts, session_id, run_sum, run_cnt, last_value = state.get
    else:
        last_ts, session_id, run_sum, run_cnt, last_value = (
            None, 0, 0.0, 0, None)

    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_ms", "turn_idx"], kind="stable")
        for r in pdf.itertuples(index=False):
            ts = int(r.ts_ms)
            if last_ts is not None and ts - last_ts > gap_ms:
                session_id += 1
                run_sum, run_cnt = 0.0, 0
            v = None if pd.isna(r.value) else float(r.value)
            prev = last_value
            if v is not None:
                run_sum += v
                run_cnt += 1
                last_value = v
            rows.append((key[0], int(r.turn_idx), ts, session_id,
                         run_sum, run_cnt, prev))
            last_ts = ts

    state.update((last_ts, session_id, run_sum, run_cnt, last_value))
    state.setTimeoutDuration(idle_timeout_ms)
    if rows:
        yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA])


def stream_running_features(
    stream: DataFrame,
    gap_ms: int = 300_000,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """stream: (conv_id, turn_idx, ts_ms, value) → per-turn running
    features with sessionization, state O(1) per conversation."""

    def fold(key, pdfs, state):
        yield from _fold(key, pdfs, state, gap_ms, idle_timeout_ms)

    return (
        stream.groupBy("conv_id").applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
