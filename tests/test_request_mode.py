"""Request-mode analog: point-in-time features for anchor rows must equal
the batch backfill's features at the same (conv_id, ts) — the
batch/online consistency guarantee (SURVEY.md §3.2)."""

import pandas as pd
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, WindowSpec
from openmldb_spark.operators.request import request_features
from openmldb_spark.operators.window import window_agg
from openmldb_spark.transcripts import transcripts_df

KEY = ["conv_id", "turn_idx"]
SPEC = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                  frame="rows_range", preceding="30m",
                  tiebreak=("turn_idx",))
AGGS = [Agg("sum", "value", "s"), Agg("count", "value", "c"),
        Agg("lag", "value", "l1", param=1)]


def test_request_equals_backfill(spark, sf_dir):
    t = transcripts_df(spark, sf_dir)
    backfill = window_agg(t, SPEC, AGGS, keep_cols=KEY,
                          tier="kernel").toPandas()

    # one request per conversation (serving evaluates requests against
    # stored history; fellow in-flight requests are not in storage, so
    # request==backfill only holds when the rest of the frame IS stored)
    req = t.where(F.col("turn_idx") == 40)
    hist = t.join(req.select(*KEY), KEY, "left_anti")

    served = request_features(req, hist, SPEC, AGGS,
                              keep_cols=KEY).toPandas()
    assert len(served) == req.count()

    merged = served.merge(backfill, on=KEY, suffixes=("", "_b"))
    assert len(merged) == len(served)
    for c in ["s", "c", "l1"]:
        a, b = merged[c], merged[f"{c}_b"]
        ok = (a.isna() & b.isna()) | ((a - b).abs() < 1e-9)
        assert ok.all(), merged[~ok].head()


def test_requests_do_not_see_each_other(spark):
    rows = [("c", i, 1_000_000 + i * 1000, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_ms", "value"])
    # two requests in one batch at turns 5 and 6
    req = df.where(F.col("turn_idx").isin(5, 6))
    hist = df.where(~F.col("turn_idx").isin(5, 6))
    out = {r.turn_idx: (r.s, r.c) for r in request_features(
        req, hist, SPEC, AGGS, keep_cols=KEY).collect()}
    # turn 6's frame: history turns 0-4,7.. (<= ts6) + itself — but NOT
    # the other request (turn 5)
    assert out[6] == (0 + 1 + 2 + 3 + 4 + 6.0, 6)
    assert out[5] == (0 + 1 + 2 + 3 + 4 + 5.0, 6)


def test_request_history_pruning_preserves_results(spark, sf_dir):
    t = transcripts_df(spark, sf_dir)
    req = t.where(F.col("turn_idx") == 20)
    hist = t.where(F.col("turn_idx") != 20)
    a = request_features(req, hist, SPEC, AGGS, keep_cols=KEY,
                         prune_history=True).toPandas().sort_values(KEY)
    b = request_features(req, hist, SPEC, AGGS, keep_cols=KEY,
                         prune_history=False).toPandas().sort_values(KEY)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_rows_merge_frame_not_starved_by_time_pruning(spark):
    """rows_merge_rows_range keeps a rows_preceding floor that admits
    history OLDER than the time depth — pruning must not starve it
    (pruned and unpruned paths must agree)."""
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_merge_rows_range", preceding="1h",
                      rows_preceding=5, tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "s"), Agg("count", "value", "c")]
    # history ends 3h before the request ts — outside the 1h time depth
    base = 1_000_000_000
    hist = spark.createDataFrame(
        [("c", i, base + i * 1000, float(i + 1)) for i in range(6)],
        ["conv_id", "turn_idx", "ts_ms", "value"])
    req = spark.createDataFrame(
        [("c", 99, base + 3 * 3_600_000, 100.0)],
        ["conv_id", "turn_idx", "ts_ms", "value"])
    pruned = request_features(req, hist, spec, aggs, keep_cols=KEY,
                              prune_history=True).collect()
    full = request_features(req, hist, spec, aggs, keep_cols=KEY,
                            prune_history=False).collect()
    assert [(r.s, r.c) for r in pruned] == [(r.s, r.c) for r in full]
    assert full[0].c > 1    # the rows floor DID admit old history


def test_prune_path_accepts_case_insensitive_order_col(spark):
    """window_agg resolves TS == ts case-insensitively; the pruning
    pre-pass must accept the same specs instead of raising."""
    import dataclasses
    spec = dataclasses.replace(SPEC, order_by="TS_MS")
    rows = [("c", i, 1_000_000 + i * 1000, float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_ms", "value"])
    req = df.where(F.col("turn_idx") == 7)
    hist = df.where(F.col("turn_idx") != 7)
    out = request_features(req, hist, spec,
                           [Agg("count", "value", "c")],
                           keep_cols=KEY, prune_history=True).collect()
    assert len(out) == 1 and out[0].c == 8
