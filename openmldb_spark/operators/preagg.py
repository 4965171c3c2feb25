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

Partials stay SPARSE (one row per occupied bucket): cum at an arbitrary
bucket b resolves as the last partial with bucket ≤ b via one
sort-within-key window over (partials ∪ lookups) — no per-key bucket
densification, whose sequence() array would explode for a sparse key
spanning years at small bucket_ms. A lookup below the key's first
bucket resolves to 0; above the last bucket it degrades to the last
known cum (partials built from a stale snapshot undercount — they never
produce negative garbage; build partials from the SAME df for exact
results).

All JVM (joins + groupBy + per-key windows); work per row is
O(bucket_size) instead of O(window_size) — the win when the window
spans many buckets (e.g. 30-day window, 1-day buckets ⇒ ~15× less
scanned).

Scope: sum/count/avg (prefix-invertible). min/max are not invertible —
use the kernel tier (or MAXSIZE-bounded frames). Semantics: closed
[t-W, t] frame over DISTINCT order keys per key — with duplicate order
keys this admits all ties (ANSI RANGE behavior), unlike the kernel's
buffered-ties rule; assert distinct keys upstream if exact OpenMLDB
tie semantics matter. Rows with NULL or negative order keys are dropped
like every window tier (reference emit-filter, window.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from openmldb_spark.operators.window import _order_col


def _bucket(ord_ms, bucket_ms: int):
    # floor, not cast-truncation: (t - W) is legitimately negative for
    # early rows and trunc-toward-zero would misbucket them
    return F.floor(ord_ms / F.lit(bucket_ms))


def build_preagg(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    bucket_ms: int,
) -> DataFrame:
    """Materialize per-(key, bucket) partials: sum/count plus the running
    (cumulative) versions used for O(1) full-bucket range sums.

    Sparse — only occupied buckets get a row; empty buckets contribute
    nothing to the running values by construction. The order column
    resolves through the same ms semantics as every window tier
    (timestamp → epoch ms, not the cast-to-long SECONDS a bare cast
    would give)."""
    ordc = _order_col(df, order_col)
    src = df.where(ordc.isNotNull() & (ordc >= 0))
    partials = (
        src.groupBy(*keys, _bucket(ordc, bucket_ms).alias("bucket"))
        .agg(F.sum(F.col(value_col).cast("double")).alias("b_sum"),
             F.count(value_col).alias("b_cnt"))
    )
    w = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0)
    return partials.select(
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
    ordc = _order_col(df, order_col)
    rows = (
        df.where(ordc.isNotNull() & (ordc >= 0))
        # a unique row id keeps exact-duplicate input rows distinct
        # through the edge-scan groupBys (grouping on data columns
        # alone would collapse duplicates and double their sums)
        .withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__ord", ordc)
        .withColumn("__bc", _bucket(ordc, bucket_ms))
        .withColumn("__bs", _bucket(ordc - window_ms, bucket_ms))
    )
    # __rid is NONDETERMINISTIC and this lineage feeds FOUR subtrees
    # (both _lk lookup streams, the edge scans, and the final join's
    # left side). If the subtrees re-evaluated it independently — after
    # a task retry, an AQE replan, or any intra-partition order change
    # in the upstream — the same __rid would bind to different rows in
    # different subtrees and the cum-lookup join would silently attach
    # the wrong window sums. An eager localCheckpoint pins the
    # assignment once: every subtree reads the SAME materialized rows
    # (a persist() is weaker — cache eviction silently recomputes).
    # Cost: one materialization of the filtered input per call; on a
    # cluster a lost executor fails the job instead of recomputing,
    # which is the correct trade for a correctness-critical id.
    rows = rows.localCheckpoint(eager=True)

    # ---- cum lookups at __bc-1 ("a") and __bs ("b"), sparse as-of ----
    # union the lookup points into the partials stream and take the
    # running last cum per key ordered by bucket (partials sort before
    # lookups at equal bucket): one window, no densification
    def _lk(bucket_expr, which):
        return rows.select(
            *keys, F.col("__rid"), bucket_expr.alias("bucket"),
            F.lit(None).cast("double").alias("cum_sum"),
            F.lit(None).cast("long").alias("cum_cnt"),
            F.lit(which).alias("__which"), F.lit(0).alias("__isp"),
        )

    stream = (
        partials.select(
            *keys, "bucket",
            F.col("cum_sum").cast("double").alias("cum_sum"),
            F.col("cum_cnt").cast("long").alias("cum_cnt"),
            F.lit(None).cast("long").alias("__rid"),
            F.lit(None).cast("string").alias("__which"),
            F.lit(1).alias("__isp"))
        .select(*keys, "__rid", "bucket", "cum_sum", "cum_cnt",
                "__which", "__isp")
        .unionByName(_lk(F.col("__bc") - 1, "a"))
        .unionByName(_lk(F.col("__bs"), "b"))
    )
    wlast = Window.partitionBy(*keys).orderBy(
        F.col("bucket").asc(), F.col("__isp").desc()).rowsBetween(
        Window.unboundedPreceding, 0)
    resolved = (
        stream
        .withColumn("__c_sum", F.last("cum_sum", ignorenulls=True).over(wlast))
        .withColumn("__c_cnt", F.last("cum_cnt", ignorenulls=True).over(wlast))
        .where(F.col("__isp") == 0)
        .groupBy("__rid")
        .agg(
            F.max(F.when(F.col("__which") == "a", F.col("__c_sum")))
            .alias("pa_cum_sum"),
            F.max(F.when(F.col("__which") == "a", F.col("__c_cnt")))
            .alias("pa_cum_cnt"),
            F.max(F.when(F.col("__which") == "b", F.col("__c_sum")))
            .alias("pb_cum_sum"),
            F.max(F.when(F.col("__which") == "b", F.col("__c_cnt")))
            .alias("pb_cum_cnt"),
        )
    )

    # inner full buckets: cum(bc-1) - cum(bs); a lookup below the key's
    # first bucket resolved to null → 0
    one_bucket = F.col("__bs") == F.col("__bc")
    rows = (
        rows.join(resolved, "__rid", "left")
        .withColumn("__inner_sum",
                    F.when(one_bucket, F.lit(0.0)).otherwise(
                        F.coalesce("pa_cum_sum", F.lit(0.0))
                        - F.coalesce("pb_cum_sum", F.lit(0.0))))
        .withColumn("__inner_cnt",
                    F.when(one_bucket, F.lit(0)).otherwise(
                        F.coalesce("pa_cum_cnt", F.lit(0))
                        - F.coalesce("pb_cum_cnt", F.lit(0))))
        .drop("pa_cum_sum", "pa_cum_cnt", "pb_cum_sum", "pb_cum_cnt")
    )

    # edge scans: raw rows of the two boundary buckets only
    raw_ord = _order_col(df, order_col)
    raw = df.where(raw_ord.isNotNull() & (raw_ord >= 0)).select(
        *[F.col(k).alias(f"h_{k}") for k in keys],
        raw_ord.alias("h_ord"),
        _bucket(raw_ord, bucket_ms).alias("h_bucket"),
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
        .drop("__rid", "__ord", "__bc", "__bs", "__inner_sum",
              "__inner_cnt", "__left_sum", "__left_cnt", "__right_sum",
              "__right_cnt")
    )
    return out
