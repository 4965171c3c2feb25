"""Sessionization by ts-gap cutoff (our extension — SURVEY.md §2.9).

The reference has no session operator; semantics are defined here: a new
session starts at the first row of a partition and whenever
``ts - previous ts > gap_ms``. Pure built-in Spark (lag + cumulative sum
over one window) — a single shuffle on the partition keys, whole-stage
codegen end to end, valid at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import SessionizeSpec
from openmldb_spark.operators.window import _order_col


def sessionize(df: DataFrame, spec: SessionizeSpec,
               tiebreak: list[str] | None = None) -> DataFrame:
    """Append an int session index (0-based per partition key)."""
    ordc = "__sess_ord"
    work = df.withColumn(ordc, _order_col(df, spec.order_by))
    w = Window.partitionBy(*spec.partition_by).orderBy(ordc, *(tiebreak or []))
    is_new = (
        F.col(ordc) - F.lag(ordc, 1).over(w) > F.lit(spec.gap)
    ).cast("long")
    out = work.withColumn(
        spec.session_col,
        F.coalesce(
            F.sum(F.coalesce(is_new, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0),
        ),
    )
    return out.drop(ordc)


def session_stats(df: DataFrame, spec: SessionizeSpec,
                  value_col: str | None = None) -> DataFrame:
    """Per-session aggregate summary (turns, span, bounds)."""
    ordc = "__sess_ord"
    sess = sessionize(df, spec).withColumn(ordc, _order_col(df, spec.order_by))
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ordc).alias("start_ms"),
        F.max(ordc).alias("end_ms"),
        (F.max(ordc) - F.min(ordc)).alias("span_ms"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return sess.groupBy(*spec.partition_by, spec.session_col).agg(*aggs)
