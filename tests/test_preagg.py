"""Long-window pre-aggregation: partials + edge scans must equal the
exact kernel on distinct-order-key data (the reference's
LongWindowOptimized contract)."""

import pandas as pd
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, WindowSpec
from openmldb_spark.operators.preagg import build_preagg, long_window_agg
from openmldb_spark.operators.window import window_agg
from openmldb_spark.transcripts import transcripts_df

KEY = ["conv_id", "turn_idx"]


def test_long_window_preagg_equals_kernel(spark, sf_dir):
    t = transcripts_df(spark, sf_dir).select(
        "conv_id", "turn_idx", "ts_ms", "value")
    window_ms = 3 * 3_600_000      # 3h window
    bucket_ms = 600_000            # 10m buckets → ~18 full + 2 edge

    partials = build_preagg(t, ["conv_id"], "ts_ms", "value", bucket_ms)
    got = long_window_agg(t, partials, ["conv_id"], "ts_ms", "value",
                          window_ms, bucket_ms).toPandas()

    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding=window_ms,
                      tiebreak=("turn_idx",))
    exp = window_agg(t, spec,
                     [Agg("sum", "value", "k_sum"),
                      Agg("count", "value", "k_cnt")],
                     keep_cols=KEY, tier="kernel").toPandas()

    m = got.merge(exp, on=KEY)
    assert len(m) == len(exp) == len(got)
    assert (m["w_cnt"] == m["k_cnt"]).all(), \
        m[m["w_cnt"] != m["k_cnt"]].head()
    assert ((m["w_sum"] - m["k_sum"]).abs() < 1e-6).all(), \
        m[(m["w_sum"] - m["k_sum"]).abs() >= 1e-6].head()
    avg_ok = (
        (m["w_avg"].isna() & (m["k_cnt"] == 0))
        | ((m["w_avg"] - m["k_sum"] / m["k_cnt"]).abs() < 1e-9)
    )
    assert avg_ok.all()


def test_preagg_same_bucket_window(spark):
    """Window shorter than a bucket: inner term must be zero, only the
    edge scan contributes."""
    rows = [("a", i, 1_000_000 + i * 1000, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_ms", "value"])
    partials = build_preagg(df, ["conv_id"], "ts_ms", "value",
                            bucket_ms=60_000)
    got = {r.turn_idx: (r.w_sum, r.w_cnt) for r in
           long_window_agg(df, partials, ["conv_id"], "ts_ms", "value",
                           window_ms=3000, bucket_ms=60_000).collect()}
    # frame [t-3s, t] = last 4 rows (1s steps)
    assert got[10] == (7.0 + 8 + 9 + 10, 4)
    assert got[0] == (0.0, 1)
    assert got[2] == (0.0 + 1 + 2, 3)


def test_preagg_partials_reusable_table(spark, sf_dir, tmp_path):
    """Partials round-trip through parquet (the materialized pre-agg
    table the reference stores online, aggregator.h)."""
    t = transcripts_df(spark, sf_dir).select(
        "conv_id", "turn_idx", "ts_ms", "value")
    p = build_preagg(t, ["conv_id"], "ts_ms", "value", 600_000)
    dest = str(tmp_path / "partials")
    p.write.mode("overwrite").parquet(dest)
    p2 = spark.read.parquet(dest)
    a = long_window_agg(t, p, ["conv_id"], "ts_ms", "value",
                        3_600_000, 600_000).toPandas()
    b = long_window_agg(t, p2, ["conv_id"], "ts_ms", "value",
                        3_600_000, 600_000).toPandas()
    a = a.sort_values(KEY).reset_index(drop=True)
    b = b.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_preagg_duplicate_rows_not_collapsed(spark):
    """Exact-duplicate input rows must each produce an output row with
    the correct (not doubled) frame sum — the review repro."""
    df = spark.createDataFrame(
        [("a", 1000, 1.0), ("a", 1000, 1.0), ("a", 2000, 2.0)],
        ["conv_id", "ts_ms", "value"])
    p = build_preagg(df, ["conv_id"], "ts_ms", "value", bucket_ms=10_000)
    got = long_window_agg(df, p, ["conv_id"], "ts_ms", "value",
                          window_ms=5000, bucket_ms=10_000).collect()
    assert len(got) == 3
    by_ts = sorted((r.ts_ms, r.w_sum, r.w_cnt) for r in got)
    assert by_ts == [(1000, 2.0, 2), (1000, 2.0, 2), (2000, 4.0, 3)]


def test_preagg_timestamp_order_col_uses_milliseconds(spark):
    """TimestampType order columns must resolve through epoch MS like
    every window tier — a bare cast('long') reads SECONDS and made
    frames 1000x too long."""
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 4_000, 2.0), ("a", 10_000, 4.0)],
        ["conv_id", "ms", "value"]).select(
        "conv_id", "value",
        F.timestamp_millis(F.col("ms").cast("long")).alias("ts"))
    p = build_preagg(df, ["conv_id"], "ts", "value", bucket_ms=2_000)
    got = {r.value: (r.w_sum, r.w_cnt) for r in
           long_window_agg(df, p, ["conv_id"], "ts", "value",
                           window_ms=5_000, bucket_ms=2_000).collect()}
    # [t-5s, t]: value=2.0 sees rows at 0 and 4000; 4.0 sees only itself
    assert got[2.0] == (3.0, 2)
    assert got[4.0] == (4.0, 1)


def test_preagg_sparse_key_no_densification(spark):
    """A key with events years apart at small buckets must not
    materialize a per-key sequence() spanning the gap (the old
    densified layout exploded); partials stay one-row-per-occupied
    bucket and results stay exact."""
    y = 365 * 86_400_000
    df = spark.createDataFrame(
        [("a", 1_000, 1.0), ("a", 4 * y, 2.0), ("a", 4 * y + 1_500, 3.0)],
        ["conv_id", "ts_ms", "value"])
    p = build_preagg(df, ["conv_id"], "ts_ms", "value", bucket_ms=1_000)
    assert p.count() == 3          # occupied buckets only
    got = {r.value: (r.w_sum, r.w_cnt) for r in
           long_window_agg(df, p, ["conv_id"], "ts_ms", "value",
                           window_ms=2_000, bucket_ms=1_000).collect()}
    assert got[1.0] == (1.0, 1)
    assert got[2.0] == (2.0, 1)
    assert got[3.0] == (5.0, 2)
