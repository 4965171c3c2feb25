"""Long-window pre-aggregation — the reference's LongWindowOptimized /
SplitAggregationOptimized pass re-expressed for Spark batch.

Reference: rewrite `agg OVER long_window` into pre-aggregated buckets +
tail scan (/root/reference/hybridse/src/passes/physical/
long_window_optimized.h:24-45; online bucket store
/root/reference/src/storage/aggregator.h:40-46,118).

Shape: a materialized per-(key, time-bucket) partials table (built once,
reused by every query over that window family — checkpoint it with
jobs/runner.py) plus per-row edge scans limited to the two boundary
buckets:

    frame_sum(t) = cum(bucket(t)-1) - cum(bucket(t-W))     # full buckets
                 + sum(raw in left  edge bucket, ord ≥ t-W)
                 + sum(raw in right edge bucket, ord ≤ t)

All JVM (joins + groupBy + one tiny per-key window over buckets); work
per row is O(bucket_size) instead of O(window_size) — the win when the
window spans many buckets (e.g. 30-day window, 1-day buckets ⇒ ~15×
less scanned).

Scope: sum/count/avg (prefix-invertible). min/max are not invertible —
use the kernel tier (or MAXSIZE-bounded frames). Semantics: closed
[t-W, t] frame over DISTINCT order keys per key — with duplicate order
keys this admits all ties (ANSI RANGE behavior), unlike the kernel's
buffered-ties rule; assert distinct keys upstream if exact OpenMLDB
tie semantics matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def build_preagg(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    bucket_ms: int,
) -> DataFrame:
    """Materialize per-(key, bucket) partials: sum/count plus the running
    (cumulative) versions used for O(1) full-bucket range sums.

    Buckets are densified per key (empty buckets carry the running
    values) so lookups are exact equi-joins."""
    b = (F.col(order_col).cast("long") / bucket_ms).cast("long")
    partials = (
        df.groupBy(*keys, b.alias("bucket"))
        .agg(F.sum(value_col).alias("b_sum"),
             F.count(value_col).alias("b_cnt"))
    )
    span = partials.groupBy(*keys).agg(
        F.min("bucket").alias("b_lo"), F.max("bucket").alias("b_hi"))
    dense = (
        span.withColumn("bucket", F.explode(
            F.sequence(F.col("b_lo"), F.col("b_hi"))))
        .drop("b_lo", "b_hi")
        .join(partials, [*keys, "bucket"], "left")
        .fillna(0, subset=["b_sum", "b_cnt"])
    )
    w = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0)
    return dense.select(
        *keys, "bucket", "b_sum", "b_cnt",
        F.sum("b_sum").over(w).alias("cum_sum"),
        F.sum("b_cnt").over(w).alias("cum_cnt"),
    )


def long_window_agg(
    df: DataFrame,
    partials: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    window_ms: int,
    bucket_ms: int,
    out_prefix: str = "w",
) -> DataFrame:
    """Closed [t-W, t] frame sum/count/avg per row via partials + edge
    scans. Returns df plus {prefix}_sum/{prefix}_cnt/{prefix}_avg."""
    ordc = F.col(order_col).cast("long")
    rows = df.withColumn("__ord", ordc) \
             .withColumn("__bc", (ordc / bucket_ms).cast("long")) \
             .withColumn("__bs", ((ordc - window_ms) / bucket_ms).cast("long"))

    def cum_at(alias: str, bucket_expr):
        """cum_{sum,cnt} at a given bucket (clamped into the key's span:
        below span → 0 via left-join miss on floor... we join exact and
        rely on densified buckets; below b_lo means zero)."""
        p = partials.select(
            *[F.col(k).alias(f"{alias}_{k}") for k in keys],
            F.col("bucket").alias(f"{alias}_bucket"),
            F.col("cum_sum").alias(f"{alias}_cum_sum"),
            F.col("cum_cnt").alias(f"{alias}_cum_cnt"),
        )
        cond = None
        for k in keys:
            c = F.col(k) == F.col(f"{alias}_{k}")
            cond = c if cond is None else cond & c
        cond = cond & (bucket_expr == F.col(f"{alias}_bucket"))
        return p, cond

    # inner full buckets: cum(bc-1) - cum(bs); missing join (bucket below
    # the key's first bucket or bc-1 < b_lo) coalesces to 0
    pa, ca = cum_at("pa", F.col("__bc") - 1)
    pb, cb = cum_at("pb", F.col("__bs"))
    # same-bucket windows (bs == bc) have no inner buckets at all
    one_bucket = F.col("__bs") == F.col("__bc")
    rows = (
        rows.join(pa, ca, "left")
        .join(pb, cb, "left")
        .withColumn("__inner_sum",
                    F.when(one_bucket, F.lit(0.0)).otherwise(
                        F.coalesce("pa_cum_sum", F.lit(0.0))
                        - F.coalesce("pb_cum_sum", F.lit(0.0))))
        .withColumn("__inner_cnt",
                    F.when(one_bucket, F.lit(0)).otherwise(
                        F.coalesce("pa_cum_cnt", F.lit(0))
                        - F.coalesce("pb_cum_cnt", F.lit(0))))
        .drop(*[f"pa_{k}" for k in keys], "pa_bucket", "pa_cum_sum",
              "pa_cum_cnt",
              *[f"pb_{k}" for k in keys], "pb_bucket", "pb_cum_sum",
              "pb_cum_cnt")
    )

    # edge scans: raw rows of the two boundary buckets only
    raw = df.select(
        *[F.col(k).alias(f"h_{k}") for k in keys],
        ordc.alias("h_ord"),
        (ordc / bucket_ms).cast("long").alias("h_bucket"),
        F.col(value_col).alias("h_val"),
    )

    def edge(rows_df, bucket_col, lo_cond, hi_cond, name):
        cond = None
        for k in keys:
            c = F.col(k) == F.col(f"h_{k}")
            cond = c if cond is None else cond & c
        cond = cond & (F.col(bucket_col) == F.col("h_bucket")) \
            & lo_cond & hi_cond
        j = rows_df.join(raw, cond, "left")
        gcols = [c for c in rows_df.columns]
        return (
            j.groupBy(*gcols)
            .agg(F.sum("h_val").alias(f"__{name}_sum"),
                 F.count("h_val").alias(f"__{name}_cnt"))
        )

    lo = F.col("h_ord") >= F.col("__ord") - window_ms
    hi = F.col("h_ord") <= F.col("__ord")
    # same-bucket window (bs == bc): one edge with both bounds
    same = rows.where(F.col("__bs") == F.col("__bc"))
    same = edge(same, "__bc", lo, hi, "left").withColumn(
        "__right_sum", F.lit(0.0)).withColumn("__right_cnt", F.lit(0))
    multi = rows.where(F.col("__bs") != F.col("__bc"))
    multi = edge(multi, "__bs", lo, F.lit(True), "left")
    multi = edge(multi, "__bc", F.lit(True), hi, "right")
    allr = same.unionByName(multi)

    total_sum = (F.col("__inner_sum")
                 + F.coalesce("__left_sum", F.lit(0.0))
                 + F.coalesce("__right_sum", F.lit(0.0)))
    total_cnt = (F.col("__inner_cnt")
                 + F.coalesce("__left_cnt", F.lit(0))
                 + F.coalesce("__right_cnt", F.lit(0)))
    out = (
        allr.withColumn(f"{out_prefix}_sum", total_sum)
        .withColumn(f"{out_prefix}_cnt", total_cnt.cast("long"))
        .withColumn(
            f"{out_prefix}_avg",
            F.when(total_cnt > 0, total_sum / total_cnt))
        .drop("__ord", "__bc", "__bs", "__inner_sum", "__inner_cnt",
              "__left_sum", "__left_cnt", "__right_sum", "__right_cnt")
    )
    return out
