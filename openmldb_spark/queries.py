"""Query registry — the driver-facing catalog of implemented operators.

Each entry pairs a PySpark implementation (built from the engine's
operators) with an ANSI-SQL oracle that DuckDB can execute over the same
parquet tables. The transcript table itself is *derived* deterministically
from the driver's ``events`` parquet by a CTE that runs identically on
Spark SQL and DuckDB (openmldb_spark/transcripts.py), so every feature
query gets a real value-level check.

Float policy: aggregates that accumulate (sum/avg) are rounded to 3
decimals on BOTH sides; pass-through doubles (min/max/lag/weight) compare
exactly because no accumulation happens.

Reference semantics per query are cited inline (file:line into
/root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, LastJoinSpec, SessionizeSpec, WindowSpec
from openmldb_spark.operators.window import window_agg
from openmldb_spark.operators.lastjoin import last_join, asof_join_kernel
from openmldb_spark.operators.sessionize import sessionize, session_stats
from openmldb_spark.transcripts import (
    transcripts_df,
    transcripts_sql,
    transcripts_updates_sql,
    updates_df,
)

MIN_30 = 1_800_000
MIN_10 = 600_000
HOUR = 3_600_000

KEY = ["conv_id", "turn_idx"]


def _round3(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 3))
    return df


# --------------------------------------------------------------------------
# Window aggregation (SURVEY.md §2.5; WindowAggPlan.scala:53-191)
# --------------------------------------------------------------------------

def q_window_rows_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS_RANGE 30m PRECEDING — kernel tier (HistoryWindow semantics)."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m",
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v"),
            Agg("min", "value", "min_v"), Agg("max", "value", "max_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")
    out = _round3(out, ["sum_v"])
    # avg as round(sum)/cnt: both engines divide bitwise-identical doubles,
    # so no rounding-boundary sensitivity (avg itself is sum/cnt anyway)
    return out.withColumn("avg_v", F.col("sum_v") / F.col("cnt_v"))


SQL_WINDOW_ROWS_RANGE = transcripts_sql(f"""
SELECT conv_id, turn_idx,
       ROUND(SUM(value) OVER w, 3) AS sum_v,
       COUNT(value) OVER w AS cnt_v,
       MIN(value) OVER w AS min_v,
       MAX(value) OVER w AS max_v,
       ROUND(SUM(value) OVER w, 3) / (COUNT(value) OVER w) AS avg_v
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY ts_ms
             RANGE BETWEEN {MIN_30} PRECEDING AND CURRENT ROW)
""")


def q_window_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS 5 PRECEDING — kernel tier."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows", preceding=5, tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v"),
            Agg("min", "value", "min_v"), Agg("max", "value", "max_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")
    return _round3(out, ["sum_v"])


SQL_WINDOW_ROWS = transcripts_sql("""
SELECT conv_id, turn_idx,
       ROUND(SUM(value) OVER w, 3) AS sum_v,
       COUNT(value) OVER w AS cnt_v,
       MIN(value) OVER w AS min_v,
       MAX(value) OVER w AS max_v
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY ts_ms
             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
""")


def q_window_builtin_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same frame through the pure-JVM builtin tier (whole-stage codegen)."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m",
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, tier="builtin")
    return _round3(out, ["sum_v"])


SQL_WINDOW_BUILTIN = transcripts_sql(f"""
SELECT conv_id, turn_idx,
       ROUND(SUM(value) OVER w, 3) AS sum_v,
       COUNT(value) OVER w AS cnt_v
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY ts_ms
             RANGE BETWEEN {MIN_30} PRECEDING AND CURRENT ROW)
""")


def q_window_maxsize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS_RANGE 30m PRECEDING MAXSIZE 3 (mem_catalog.h:430-438)."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m", max_size=3,
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")
    return _round3(out, ["sum_v"])


SQL_WINDOW_MAXSIZE = transcripts_sql(f"""
, cand AS (
  SELECT t.conv_id, t.turn_idx, h.value,
         ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                            ORDER BY h.ts_ms DESC) AS rk
  FROM transcripts t JOIN transcripts h
    ON h.conv_id = t.conv_id
   AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {MIN_30}
)
SELECT conv_id, turn_idx, ROUND(SUM(value), 3) AS sum_v,
       COUNT(value) AS cnt_v
FROM cand WHERE rk <= 3 GROUP BY conv_id, turn_idx
""")


def q_window_exclude_current_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT_TIME over an hour-truncated (duplicate-ts) order key
    (BufferCurrentTimeBuffer, mem_catalog.h:459-468)."""
    t = transcripts_df(spark, sf_dir).withColumn(
        "ts_b", F.col("ts_ms") - F.col("ts_ms") % HOUR
    )
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_b",
                      frame="rows_range", preceding="2h",
                      exclude_current_time=True, tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")
    return _round3(out, ["sum_v"])


SQL_WINDOW_EXCLUDE_CT = transcripts_sql(f"""
, tb AS (
  SELECT conv_id, turn_idx, value, ts_ms - ts_ms % {HOUR} AS ts_b
  FROM transcripts
)
SELECT t.conv_id, t.turn_idx,
       ROUND(t.value + COALESCE(SUM(h.value), 0), 3) AS sum_v,
       CAST(1 + COUNT(h.value) AS BIGINT) AS cnt_v
FROM tb t LEFT JOIN tb h
  ON h.conv_id = t.conv_id
 AND h.ts_b < t.ts_b AND h.ts_b >= t.ts_b - {2 * HOUR}
GROUP BY t.conv_id, t.turn_idx, t.value
""")


def q_window_end_offset_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two frames stitched on the natural key (the reference's ConcatJoin
    role, SURVEY.md §2.3): [30m, 10m] PRECEDING and (OPEN 30m, CURRENT]."""
    t = transcripts_df(spark, sf_dir)
    mid = window_agg(
        t,
        WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                   frame="rows_range", preceding="30m", end_offset="10m",
                   tiebreak=("turn_idx",)),
        [Agg("sum", "value", "sum_mid"), Agg("count", "value", "cnt_mid")],
        keep_cols=KEY, tier="kernel",
    )
    op = window_agg(
        t,
        WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                   frame="rows_range", preceding="30m", start_open=True,
                   tiebreak=("turn_idx",)),
        [Agg("sum", "value", "sum_open"), Agg("count", "value", "cnt_open")],
        keep_cols=KEY, tier="kernel",
    )
    out = mid.join(op, KEY)
    return _round3(out, ["sum_mid", "sum_open"])


SQL_WINDOW_END_OFFSET_OPEN = transcripts_sql(f"""
SELECT t.conv_id, t.turn_idx,
       ROUND(SUM(CASE WHEN h.ts_ms <= t.ts_ms - {MIN_10} THEN h.value END), 3)
           AS sum_mid,
       COUNT(CASE WHEN h.ts_ms <= t.ts_ms - {MIN_10} THEN h.value END)
           AS cnt_mid,
       ROUND(SUM(CASE WHEN h.ts_ms > t.ts_ms - {MIN_30} THEN h.value END), 3)
           AS sum_open,
       COUNT(CASE WHEN h.ts_ms > t.ts_ms - {MIN_30} THEN h.value END)
           AS cnt_open
FROM transcripts t LEFT JOIN transcripts h
  ON h.conv_id = t.conv_id
 AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {MIN_30}
GROUP BY t.conv_id, t.turn_idx
""")


# --------------------------------------------------------------------------
# WINDOW UNION backfill (SURVEY.md §2.5; WindowAggPlanUtil.scala:50-92)
# --------------------------------------------------------------------------

def q_window_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame over primary ∪ updates; only primary rows emit."""
    t = transcripts_df(spark, sf_dir)
    u = updates_df(spark, sf_dir).select(
        "conv_id", "ts_ms", F.col("weight").alias("value")
    )
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m",
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, union=[u], tier="kernel")
    return _round3(out, ["sum_v"])


SQL_WINDOW_UNION = transcripts_updates_sql(f"""
, uni AS (
  SELECT conv_id, ts_ms, value FROM transcripts
  UNION ALL
  SELECT conv_id, ts_ms, weight AS value FROM updates
)
SELECT t.conv_id, t.turn_idx,
       ROUND(SUM(h.value), 3) AS sum_v,
       COUNT(h.value) AS cnt_v
FROM transcripts t JOIN uni h
  ON h.conv_id = t.conv_id
 AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {MIN_30}
GROUP BY t.conv_id, t.turn_idx
""")


def q_window_union_instance_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTANCE_NOT_IN_WINDOW: only union rows buffer; anchor joins its own
    frame (WindowAggPlan.scala:589-593; test_window_union.yaml id 13)."""
    t = transcripts_df(spark, sf_dir)
    u = updates_df(spark, sf_dir).select(
        "conv_id", "ts_ms", F.col("weight").alias("value")
    )
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m",
                      instance_not_in_window=True, tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_v"), Agg("count", "value", "cnt_v")]
    out = window_agg(t, spec, aggs, keep_cols=KEY, union=[u], tier="kernel")
    return _round3(out, ["sum_v"])


SQL_WINDOW_UNION_INIW = transcripts_updates_sql(f"""
SELECT t.conv_id, t.turn_idx,
       ROUND(t.value + COALESCE(SUM(u.weight), 0), 3) AS sum_v,
       CAST(1 + COUNT(u.weight) AS BIGINT) AS cnt_v
FROM transcripts t LEFT JOIN updates u
  ON u.conv_id = t.conv_id
 AND u.ts_ms <= t.ts_ms AND u.ts_ms >= t.ts_ms - {MIN_30}
GROUP BY t.conv_id, t.turn_idx, t.value
""")


# --------------------------------------------------------------------------
# LAST JOIN / as-of join (SURVEY.md §2.3; JoinPlan.scala:151-196)
# --------------------------------------------------------------------------

def q_last_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST JOIN ORDER BY ts: newest update at or before each turn."""
    t = transcripts_df(spark, sf_dir).select(*KEY, "ts_ms")
    u = updates_df(spark, sf_dir).select("conv_id", "ts_ms", "cfg", "weight")
    spec = LastJoinSpec(left_on=["conv_id"], order_by="ts_ms",
                        condition="__r_ord <= ts_ms", tiebreak=("cfg",))
    out = last_join(t, u, spec, right_cols=["cfg", "weight"])
    return out.select(*KEY, "cfg", "weight")


SQL_LAST_JOIN = transcripts_updates_sql("""
, j AS (
  SELECT t.conv_id, t.turn_idx, u.cfg, u.weight,
         ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                            ORDER BY u.ts_ms DESC, u.cfg DESC) AS rk
  FROM transcripts t LEFT JOIN updates u
    ON u.conv_id = t.conv_id AND u.ts_ms <= t.ts_ms
)
SELECT conv_id, turn_idx, cfg, weight FROM j WHERE rk = 1
""")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge as-of kernel (cogroup + merge_asof) — shuffle-minimal plan
    for two huge sides; same semantics as q_last_join."""
    t = transcripts_df(spark, sf_dir).select(*KEY, "ts_ms")
    u = updates_df(spark, sf_dir).select("conv_id", "ts_ms", "cfg", "weight")
    out = asof_join_kernel(t, u, on=["conv_id"], left_ts="ts_ms",
                           right_ts="ts_ms", right_cols=["cfg", "weight"])
    return out.select(*KEY, "cfg", "weight")


SQL_ASOF_JOIN = SQL_LAST_JOIN


def q_last_join_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered LAST JOIN — one deterministic match per left row
    (JoinPlan.scala:190-196; tie pinned by tiebreak, newest cfg)."""
    t = transcripts_df(spark, sf_dir).select(*KEY)
    u = updates_df(spark, sf_dir).select("conv_id", "cfg", "weight",
                                         F.col("ts_ms").alias("u_ts"))
    spec = LastJoinSpec(left_on=["conv_id"], order_by=None,
                        tiebreak=("u_ts",))
    out = last_join(t, u, spec, right_cols=["cfg", "weight"])
    return out.select(*KEY, "cfg", "weight")


SQL_LAST_JOIN_UNORDERED = transcripts_updates_sql("""
, j AS (
  SELECT t.conv_id, t.turn_idx, u.cfg, u.weight,
         ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                            ORDER BY u.ts_ms DESC) AS rk
  FROM transcripts t LEFT JOIN updates u ON u.conv_id = t.conv_id
)
SELECT conv_id, turn_idx, cfg, weight FROM j WHERE rk = 1
""")


# --------------------------------------------------------------------------
# Sessionization + lag/lead (SURVEY.md §2.9 — our extension)
# --------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    spec = SessionizeSpec(partition_by=["conv_id"], order_by="ts_ms",
                          gap_ms="5m")
    return sessionize(t, spec).select(*KEY, "session_id")


SQL_SESSIONIZE = transcripts_sql("""
, lagd AS (
  SELECT conv_id, turn_idx, ts_ms,
         LAG(ts_ms) OVER (PARTITION BY conv_id ORDER BY ts_ms) AS prev_ts
  FROM transcripts
)
SELECT conv_id, turn_idx,
       CAST(SUM(CASE WHEN ts_ms - prev_ts > 300000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY ts_ms
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM lagd
""")


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    spec = SessionizeSpec(partition_by=["conv_id"], order_by="ts_ms",
                          gap_ms="5m")
    return session_stats(t, spec, value_col="value").select(
        "conv_id", "session_id", "n_turns", "start_ms", "end_ms",
        "span_ms", "sum_value",
    )


SQL_SESSION_STATS = transcripts_sql("""
, lagd AS (
  SELECT conv_id, ts_ms, value,
         LAG(ts_ms) OVER (PARTITION BY conv_id ORDER BY ts_ms) AS prev_ts
  FROM transcripts
), sess AS (
  SELECT conv_id, ts_ms, value,
         CAST(SUM(CASE WHEN ts_ms - prev_ts > 300000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id ORDER BY ts_ms
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM lagd
)
SELECT conv_id, session_id, COUNT(*) AS n_turns,
       MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       MAX(ts_ms) - MIN(ts_ms) AS span_ms,
       ROUND(SUM(value), 4) AS sum_value
FROM sess GROUP BY conv_id, session_id
""")


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value in secondary-sorted groups (builtin tier)."""
    t = transcripts_df(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("ts_ms", "turn_idx")
    return t.select(
        *KEY,
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("role", 2).over(w).alias("lag_role2"),
        F.lead("value", 1).over(w).alias("lead1"),
        F.first("value").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("first_v"),
    )


SQL_LAG_LEAD = transcripts_sql("""
SELECT conv_id, turn_idx,
       LAG(value, 1) OVER w AS lag1,
       LAG(role, 2) OVER w AS lag_role2,
       LEAD(value, 1) OVER w AS lead1,
       FIRST_VALUE(value) OVER (PARTITION BY conv_id ORDER BY ts_ms, turn_idx
                                ROWS UNBOUNDED PRECEDING) AS first_v
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY ts_ms, turn_idx)
""")


# --------------------------------------------------------------------------
# Frame-scoped UDAFs: top / top_n_frequency / *_cate / distinct_count
# (default_udf_library.cc:2389-2414, feature_zero_def.cc:438-665)
# --------------------------------------------------------------------------

def q_topn_frequency_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="1h",
                      tiebreak=("turn_idx",))
    aggs = [Agg("top_n_frequency", "tool", "top_tools", param=2),
            Agg("distinct_count", "tool", "n_tools")]
    return window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")


SQL_TOPN_FREQUENCY = transcripts_sql(f"""
, cand AS (
  SELECT t.conv_id, t.turn_idx, h.tool, COUNT(*) AS c
  FROM transcripts t JOIN transcripts h
    ON h.conv_id = t.conv_id
   AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {HOUR}
  WHERE h.tool IS NOT NULL
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY c DESC, tool ASC) AS rk
  FROM cand
), agg AS (
  SELECT conv_id, turn_idx,
         STRING_AGG(tool, ',' ORDER BY rk) AS top_tools,
         CAST(COUNT(*) AS BIGINT) AS n_tools
  FROM ranked WHERE rk <= 2 GROUP BY 1, 2
), nt AS (
  SELECT t.conv_id, t.turn_idx, COUNT(DISTINCT h.tool) AS n_tools
  FROM transcripts t LEFT JOIN transcripts h
    ON h.conv_id = t.conv_id
   AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {HOUR}
  GROUP BY 1, 2
)
SELECT n.conv_id, n.turn_idx,
       COALESCE(a.top_tools, '') AS top_tools,
       n.n_tools
FROM nt n LEFT JOIN agg a
  ON a.conv_id = n.conv_id AND a.turn_idx = n.turn_idx
""")


def q_top_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top(turn_idx, 3): csv of 3 largest frame values
    (TopKDef, default_udf_library.cc:2389-2414)."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="1h",
                      tiebreak=("turn_idx",))
    aggs = [Agg("top", "turn_idx", "top3", param=3)]
    return window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")


SQL_TOP_WINDOW = transcripts_sql(f"""
, cand AS (
  SELECT t.conv_id, t.turn_idx, h.turn_idx AS hv,
         ROW_NUMBER() OVER (PARTITION BY t.conv_id, t.turn_idx
                            ORDER BY h.turn_idx DESC) AS rk
  FROM transcripts t JOIN transcripts h
    ON h.conv_id = t.conv_id
   AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {HOUR}
)
SELECT conv_id, turn_idx,
       STRING_AGG(CAST(hv AS VARCHAR), ',' ORDER BY rk) AS top3
FROM cand WHERE rk <= 3 GROUP BY conv_id, turn_idx
""")


def q_count_cate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_cate(value, role): per-category counts within the frame,
    emitted as "k:v,..." sorted by key (*_by_category_def.cc)."""
    t = transcripts_df(spark, sf_dir)
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="1h",
                      tiebreak=("turn_idx",))
    aggs = [Agg("count_cate", "value", "role_counts", cate="role")]
    return window_agg(t, spec, aggs, keep_cols=KEY, tier="kernel")


SQL_COUNT_CATE = transcripts_sql(f"""
, cand AS (
  SELECT t.conv_id, t.turn_idx, h.role AS k, COUNT(h.value) AS c
  FROM transcripts t JOIN transcripts h
    ON h.conv_id = t.conv_id
   AND h.ts_ms <= t.ts_ms AND h.ts_ms >= t.ts_ms - {HOUR}
  GROUP BY 1, 2, 3
)
SELECT conv_id, turn_idx,
       STRING_AGG(k || ':' || CAST(c AS VARCHAR), ',' ORDER BY k)
           AS role_counts
FROM cand GROUP BY conv_id, turn_idx
""")


# --------------------------------------------------------------------------
# Group aggregation / joins / HAVING (SURVEY.md §2.2-2.4)
# --------------------------------------------------------------------------

def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape: scan-filter-groupagg-having, all builtin
    (GroupByAggregationPlan.scala:38-170 → df.groupBy().agg())."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            (F.round(F.sum("l_discount"), 3) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") > 10)
    )
    return out


SQL_GROUPBY_AGG = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       ROUND(SUM(l_discount), 3) / COUNT(*) AS avg_disc,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
"""


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + broadcast dim + group agg: revenue per nation."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("cnt"))
    )
    return out


SQL_JOIN_AGG = """
SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS cnt
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Scalar function surface (SURVEY.md §2.8; default_udf_library.cc)
# --------------------------------------------------------------------------

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/date/null functions from the OpenMLDB 112-builtin
    library, all compiled to Catalyst built-ins via functions/registry.py."""
    from openmldb_spark.functions.registry import fn

    t = transcripts_df(spark, sf_dir)
    ts = F.timestamp_millis(F.col("ts_ms"))
    return t.select(
        *KEY,
        fn("ucase")("role").alias("role_uc"),
        fn("substr")("text", F.lit(1), F.lit(10)).alias("text10"),
        fn("concat_ws")("-", F.col("role"), F.col("tool")).alias("rt"),
        fn("char_length")("text").alias("text_len"),
        fn("reverse")("role").alias("role_rev"),
        fn("replace")("role", "o", "0").alias("role_repl"),
        fn("strcmp")(F.col("role"), F.lit("tool")).alias("cmp_tool"),
        fn("abs")(F.col("value") - 50).alias("abs_v"),
        fn("floor")("value").cast("long").alias("floor_v"),
        fn("ceil")("value").cast("long").alias("ceil_v"),
        F.round(fn("sqrt")("value"), 6).alias("sqrt_v"),
        F.round(fn("ln")(F.col("value") + 1), 6).alias("ln_v"),
        fn("truncate")("value").alias("trunc_v"),
        fn("pow")(F.col("value"), 2.0).alias("pow_v"),
        fn("year")(ts).alias("y"),
        fn("month")(ts).alias("mo"),
        fn("day")(ts).alias("d"),
        fn("hour")(ts).alias("h"),
        fn("minute")(ts).alias("mi"),
        fn("dayofweek")(ts).alias("dow"),
        fn("if_null")(F.col("tool"), F.lit("none")).alias("tool_nn"),
        fn("is_null")("tool").alias("tool_isnull"),
        fn("nvl2")(F.col("tool"), F.lit(1), F.lit(0)).alias("has_tool"),
        fn("minimum")(F.col("value"), F.lit(50.0)).alias("min50"),
        fn("int32")(F.col("turn_idx") % 7).alias("mod7"),
    )


SQL_SCALAR_FUNCS = transcripts_sql("""
SELECT conv_id, turn_idx,
       UPPER(role) AS role_uc,
       SUBSTR(text, 1, 10) AS text10,
       CONCAT_WS('-', role, tool) AS rt,
       CAST(LENGTH(text) AS INT) AS text_len,
       REVERSE(role) AS role_rev,
       REPLACE(role, 'o', '0') AS role_repl,
       CASE WHEN role < 'tool' THEN -1 WHEN role > 'tool' THEN 1 ELSE 0 END
           AS cmp_tool,
       ABS(value - 50) AS abs_v,
       CAST(FLOOR(value) AS BIGINT) AS floor_v,
       CAST(CEIL(value) AS BIGINT) AS ceil_v,
       ROUND(SQRT(value), 6) AS sqrt_v,
       ROUND(LN(value + 1), 6) AS ln_v,
       TRUNC(value) AS trunc_v,
       POW(value, 2) AS pow_v,
       CAST(YEAR(epoch_ms(ts_ms)) AS INT) AS y,
       CAST(MONTH(epoch_ms(ts_ms)) AS INT) AS mo,
       CAST(DAY(epoch_ms(ts_ms)) AS INT) AS d,
       CAST(HOUR(epoch_ms(ts_ms)) AS INT) AS h,
       CAST(MINUTE(epoch_ms(ts_ms)) AS INT) AS mi,
       CAST(DAYOFWEEK(epoch_ms(ts_ms)) + 1 AS INT) AS dow,
       COALESCE(tool, 'none') AS tool_nn,
       tool IS NULL AS tool_isnull,
       CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS has_tool,
       LEAST(value, 50.0) AS min50,
       CAST(turn_idx % 7 AS INT) AS mod7
FROM transcripts
""")


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "window_rows_range": q_window_rows_range,
    "window_rows": q_window_rows,
    "window_builtin_tier": q_window_builtin_tier,
    "window_maxsize": q_window_maxsize,
    "window_exclude_current_time": q_window_exclude_current_time,
    "window_end_offset_open": q_window_end_offset_open,
    "window_union": q_window_union,
    "window_union_instance_not_in": q_window_union_instance_not_in,
    "last_join": q_last_join,
    "asof_join": q_asof_join,
    "last_join_unordered": q_last_join_unordered,
    "sessionize": q_sessionize,
    "session_stats": q_session_stats,
    "lag_lead": q_lag_lead,
    "topn_frequency_window": q_topn_frequency_window,
    "top_window": q_top_window,
    "count_cate_window": q_count_cate_window,
    "groupby_agg": q_groupby_agg,
    "join_agg": q_join_agg,
    "scalar_funcs": q_scalar_funcs,
}

ORACLES: dict[str, str] = {
    "window_rows_range": SQL_WINDOW_ROWS_RANGE,
    "window_rows": SQL_WINDOW_ROWS,
    "window_builtin_tier": SQL_WINDOW_BUILTIN,
    "window_maxsize": SQL_WINDOW_MAXSIZE,
    "window_exclude_current_time": SQL_WINDOW_EXCLUDE_CT,
    "window_end_offset_open": SQL_WINDOW_END_OFFSET_OPEN,
    "window_union": SQL_WINDOW_UNION,
    "window_union_instance_not_in": SQL_WINDOW_UNION_INIW,
    "last_join": SQL_LAST_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "last_join_unordered": SQL_LAST_JOIN_UNORDERED,
    "sessionize": SQL_SESSIONIZE,
    "session_stats": SQL_SESSION_STATS,
    "lag_lead": SQL_LAG_LEAD,
    "topn_frequency_window": SQL_TOPN_FREQUENCY,
    "top_window": SQL_TOP_WINDOW,
    "count_cate_window": SQL_COUNT_CATE,
    "groupby_agg": SQL_GROUPBY_AGG,
    "join_agg": SQL_JOIN_AGG,
    "scalar_funcs": SQL_SCALAR_FUNCS,
}
