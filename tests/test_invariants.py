"""North-rule invariants (BASELINE.json):

1. Zero temporal leakage: recomputing any feature with all rows
   ts' > ts(anchor) removed leaves the anchor's feature vector unchanged.
2. Per-turn text equality under stable (ts, turn_idx) ordering across
   shuffles/partitionings.
3. Skew chunking (bucket_ms) produces identical results to the unchunked
   kernel — the expand-and-flag replication is semantics-preserving.
4. allclose float parity between kernel tier and Spark builtin tier.
"""

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, WindowSpec
from openmldb_spark.operators.window import window_agg
from openmldb_spark.transcripts import transcripts_df


SPEC = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                  frame="rows_range", preceding="30m",
                  tiebreak=("turn_idx",))
AGGS = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v"),
        Agg("min", "value", "min_v"), Agg("lag", "value", "l1", param=1)]
KEY = ["conv_id", "turn_idx"]


def _fv(df):
    return {
        (r.conv_id, r.turn_idx): (r.sum_v, r.cnt_v, r.min_v, r.l1)
        for r in df.collect()
    }


def test_zero_temporal_leakage(spark, sf_dir):
    """Ablation: drop all rows after a cutoff; features at/before the
    cutoff must be bit-identical (no feature reads the future)."""
    t = transcripts_df(spark, sf_dir)
    full = _fv(window_agg(t, SPEC, AGGS, keep_cols=KEY, tier="kernel"))

    cutoff = t.approxQuantile("ts_ms", [0.5], 0.0)[0]
    trunc = t.where(F.col("ts_ms") <= cutoff)
    ablated = _fv(window_agg(trunc, SPEC, AGGS, keep_cols=KEY, tier="kernel"))

    assert len(ablated) > 0
    for k, v in ablated.items():
        fv = full[k]
        for a, b in zip(v, fv):
            if a is None or (isinstance(a, float) and pd.isna(a)):
                assert b is None or (isinstance(b, float) and pd.isna(b)), k
            else:
                assert a == b, (k, v, fv)


def test_stable_turn_ordering_text_equality(spark, sf_dir):
    """Per-turn text equality under stable ordering, independent of
    physical partitioning (input_hint invariant)."""
    t = transcripts_df(spark, sf_dir)
    a = t.orderBy("conv_id", "ts_ms", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    b = (
        t.repartition(17, "conv_id")
        .sortWithinPartitions("conv_id", "ts_ms", "turn_idx")
        .orderBy("conv_id", "ts_ms", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    assert a == b


def test_bucket_ms_chunking_equals_unchunked(spark, sf_dir):
    """Time-bucket chunking with history replication (the skew path,
    SkewDataFrameUtils.genUnionDf analog) must be a pure physical
    rewrite. Buffer-bounded functions (lag/at) are excluded: replicated
    history only spans the frame depth, so chunking them would be wrong
    on sparse keys — window_agg rejects the combination outright."""
    import pytest

    t = transcripts_df(spark, sf_dir)
    frame_aggs = [a for a in AGGS if a.func not in ("lag", "at")]

    def fv(df):
        return {(r.conv_id, r.turn_idx): (r.sum_v, r.cnt_v, r.min_v)
                for r in df.collect()}

    base = fv(window_agg(t, SPEC, frame_aggs, keep_cols=KEY,
                         tier="kernel"))
    chunked = fv(window_agg(t, SPEC, frame_aggs, keep_cols=KEY,
                            tier="kernel", bucket_ms=3_600_000))
    with pytest.raises(ValueError, match="buffer-bounded"):
        window_agg(t, SPEC, AGGS, keep_cols=KEY, tier="kernel",
                   bucket_ms=3_600_000)
    assert set(base) == set(chunked)
    for k in base:
        for a, b in zip(base[k], chunked[k]):
            if a is None or (isinstance(a, float) and pd.isna(a)):
                assert b is None or (isinstance(b, float) and pd.isna(b)), k
            elif isinstance(a, float):
                # prefix sums restart per chunk → last-ulp differences
                assert abs(a - b) <= 1e-9 * (1 + abs(a)), (k, base[k], chunked[k])
            else:
                assert a == b, (k, base[k], chunked[k])


def test_kernel_vs_builtin_allclose(spark, sf_dir):
    """Differential: kernel tier vs pure-JVM builtin tier where semantics
    coincide (the reference's own trick, TestWindowSkewOpt.scala:64-68)."""
    t = transcripts_df(spark, sf_dir)
    aggs = [Agg("sum", "value", "s"), Agg("count", "value", "c"),
            Agg("avg", "value", "a"), Agg("min", "value", "mn"),
            Agg("max", "value", "mx")]
    k = window_agg(t, SPEC, aggs, keep_cols=KEY, tier="kernel").toPandas()
    b = window_agg(t, SPEC, aggs, keep_cols=KEY, tier="builtin").toPandas()
    k = k.sort_values(KEY).reset_index(drop=True)
    b = b.sort_values(KEY).reset_index(drop=True)
    assert len(k) == len(b)
    for c in ["s", "c", "a", "mn", "mx"]:
        np.testing.assert_allclose(
            k[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-12)


def test_skewed_key_chunking(spark):
    """One hot conversation (half of all rows) — chunked vs unchunked
    equality under skew, and chunking yields more work units."""
    n_hot, n_cold = 4000, 40
    rows = (
        [("hot", i, 1_000_000 + i * 700, float(i % 100)) for i in range(n_hot)]
        + [(f"c{j}", i, 1_000_000 + i * 50_000, float(i))
           for j in range(20) for i in range(n_cold)]
    )
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_ms", "value"])
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="60s",
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "s"), Agg("count", "value", "c")]
    base = window_agg(df, spec, aggs, keep_cols=KEY, tier="kernel").toPandas()
    chunked = window_agg(df, spec, aggs, keep_cols=KEY, tier="kernel",
                         bucket_ms=120_000).toPandas()
    base = base.sort_values(KEY).reset_index(drop=True)
    chunked = chunked.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, chunked)


def test_salt_quantiles_rows_frame_equals_unsalted(spark):
    """Percentile skew salting (the reference's SkewDataFrameUtils port)
    is a pure physical rewrite for ROWS frames under a hot key."""
    n_hot, n_cold = 3000, 50
    rows = (
        [("hot", i, 1_000_000 + i * 700, float(i % 97)) for i in range(n_hot)]
        + [(f"c{j}", i, 1_000_000 + i * 50_000, float(i))
           for j in range(10) for i in range(n_cold)]
    )
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts_ms", "value"])
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows", preceding=7, tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "s"), Agg("count", "value", "c"),
            Agg("lag", "value", "l1", param=1)]
    base = window_agg(df, spec, aggs, keep_cols=KEY,
                      tier="kernel").toPandas().sort_values(KEY).reset_index(drop=True)
    salted = window_agg(df, spec, aggs, keep_cols=KEY, tier="kernel",
                        salt_quantiles=8).toPandas().sort_values(KEY).reset_index(drop=True)
    assert len(base) == len(salted) == len(rows)
    pd.testing.assert_frame_equal(base, salted)


# --------------------------------------------------------------------------
# Wide string-heavy "news-like" schema (production-script shape):
# guards the frame kernel's multi-agg path at realistic width
# (dozens of aggregates per window, mixed types, hot keys, nulls)
# --------------------------------------------------------------------------

def _news_like(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    users = [f"u{i}" for i in range(12)] + ["hot"] * 8   # skewed user key
    rows = []
    for i in range(n):
        rows.append((
            f"ik{i}",
            int(1_600_000_000_000 + rng.integers(0, 7_200_000)),
            str(rng.choice(users)),
            f"news{int(rng.integers(0, 40))}",
            f"cat{int(rng.integers(0, 6))}",
            f"media{int(rng.integers(0, 9))}",
            None if rng.random() < 0.1 else int(rng.integers(0, 500)),
            None if rng.random() < 0.1 else float(rng.random() * 100),
            int(rng.integers(0, 2)),
            f"tag{int(rng.integers(0, 15))}",
        ))
    return spark.createDataFrame(
        rows, "InstanceKey string, RequestDatetime bigint, UserId string, "
              "NewsId string, CategoryId string, MediaId string, "
              "ContentWords int, Score double, Clicked int, Tag string")


def test_wide_schema_kernel_vs_builtin(spark):
    """Kernel vs pure-JVM builtin tier over a news-like schema with 10
    aggregates in one window pass (multi-agg width; hot UserId key)."""
    t = _news_like(spark)
    spec = WindowSpec(partition_by=["UserId"], order_by="RequestDatetime",
                      frame="rows_range", preceding="2h",
                      tiebreak=("InstanceKey",))
    aggs = [Agg("sum", "ContentWords", "s1"), Agg("count", "ContentWords", "c1"),
            Agg("avg", "ContentWords", "a1"), Agg("min", "ContentWords", "m1"),
            Agg("max", "ContentWords", "x1"),
            Agg("sum", "Score", "s2"), Agg("count", "Score", "c2"),
            Agg("avg", "Score", "a2"), Agg("min", "Score", "m2"),
            Agg("max", "Score", "x2")]
    key = ["InstanceKey"]
    k = window_agg(t, spec, aggs, keep_cols=key, tier="kernel") \
        .toPandas().sort_values(key).reset_index(drop=True)
    b = window_agg(t, spec, aggs, keep_cols=key, tier="builtin") \
        .toPandas().sort_values(key).reset_index(drop=True)
    assert len(k) == len(b) == t.count()
    for c in ("s1", "c1", "a1", "m1", "x1", "s2", "c2", "a2", "m2", "x2"):
        np.testing.assert_allclose(
            k[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-12)


def test_wide_schema_sql_leakage_ablation(spark):
    """Leakage ablation over a production-shaped SQL statement (two
    windows, string UDAFs, CASE+lag guards): dropping all rows after a
    cutoff leaves features at/before the cutoff unchanged."""
    from openmldb_spark.sqlfe import run_sql

    sql = """
    select InstanceKey, UserId, RequestDatetime,
        fz_top1_ratio(NewsId) over w_user as top1_news,
        distinct_count(CategoryId) over w_user as uniq_cat,
        fz_topn_frequency(MediaId, 3) over w_user as top3_media,
        count(Clicked) over w_user as n_clicks,
        sum(ContentWords) over w_user as sum_words,
        case when !isnull(lag(Tag, 0)) over w_cat then
            count(Tag) over w_cat else null end as cat_tag_count,
        avg(Score) over w_cat as avg_score
    from {0}
    window w_user as (partition by UserId order by RequestDatetime
                      rows_range between 2h preceding and 0s preceding),
          w_cat as (partition by CategoryId order by RequestDatetime
                    rows between 100 preceding and 0 preceding);
    """
    t = _news_like(spark)
    full = {(r["InstanceKey"]): tuple(r)
            for r in run_sql(spark, sql, [t]).collect()}
    cutoff = t.approxQuantile("RequestDatetime", [0.5], 0.0)[0]
    trunc = t.where(F.col("RequestDatetime") <= cutoff)
    ablated = {(r["InstanceKey"]): tuple(r)
               for r in run_sql(spark, sql, [trunc]).collect()}
    assert len(ablated) > 100
    for k, v in ablated.items():
        assert v == full[k], (k, v, full[k])
