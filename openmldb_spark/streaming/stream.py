"""Structured Streaming tier — the online/request side of the reference
re-expressed Spark-natively.

OpenMLDB's real-time path is request-response lookup over indexed state
(RequestRunSession, /root/reference/hybridse/include/vm/engine.h:239-272)
— no stream operators exist there (SURVEY.md §2.9). The Spark-native
equivalent of "features continuously up to date" is Structured
Streaming:

- ``stream_window_counts``: watermarked tumbling-window aggregates per
  conversation (late data handled by the watermark).
- ``stream_sessionize``: ts-gap sessionization via the built-in
  ``session_window`` (same gap semantics as the batch operator).
- ``foreach_batch_features``: per-micro-batch execution of ANY batch
  operator of this engine (window kernel, as-of join, ...) — the
  batch/stream consistency guarantee comes from running the same code,
  exactly like the reference derives online and offline plans from one
  logical plan.

All stateful ops carry watermarks so state is bounded; sinks are
checkpointed by Spark itself (exactly-once per sink contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def stream_window_counts(
    stream: DataFrame,
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window per-key aggregates with late-data watermark."""
    keys = keys or ["conv_id"]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(F.col(ts_col), window_dur).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(*keys, F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "n_turns", "sum_value", "min_value", "max_value")
    )


def stream_sessionize(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Session aggregates with the same ts-gap cutoff as the batch
    sessionize operator (session closes after `gap` of silence)."""
    keys = keys or ["conv_id"]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(F.col(ts_col), gap).alias("sess"))
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(value_col).alias("sum_value"))
        .select(*keys, F.col("sess.start").alias("sess_start"),
                F.col("sess.end").alias("sess_end"),
                "n_turns", "sum_value")
    )


def foreach_batch_features(
    stream: DataFrame,
    batch_op: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
):
    """Run a batch operator of this engine on each micro-batch and hand
    the result to `sink(df, batch_id)`. Returns the DataStreamWriter
    (caller starts it with .start() / .trigger(...))."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_op(batch_df), batch_id)

    return stream.writeStream.foreachBatch(process)
