"""Deterministic multi-turn transcript table (the engine's canonical input).

``BASELINE.json::input_hint`` fixes the shape:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  The sandbox test data has no transcripts table, so we
*derive* one deterministically from the driver-generated ``events`` parquet
with pure SQL that runs identically on Spark SQL and DuckDB — that way the
driver's DuckDB oracle can rebuild the exact same table and every
transcript-based query gets a real value-level correctness check.

Determinism notes:
- ``event_id`` is unique → ROW_NUMBER tie-free.
- ``ts_ms`` is a strictly increasing per-conversation cumulative sum of
  variable steps (1..565 s), so the ordering key is unique within a
  conversation (duplicate-timestamp semantics are exercised separately via
  the minute-truncated ``ts_r_ms``).
- Only SQL constructs with identical semantics in Spark SQL and DuckDB are
  used (CONCAT with COALESCE'd args, CASE, %, ROW_NUMBER, SUM OVER ROWS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Number of synthetic conversations the events stream is folded into.
N_CONVS = 200
TS_BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z

# Shared CTE body: given a view/table `events`, produce `transcripts`.
# Runs unmodified on both Spark SQL and DuckDB.
TRANSCRIPTS_CTE = f"""
ev AS (
  SELECT
    event_id,
    user_id % {N_CONVS} AS conv_n,
    COALESCE(event_type, 'none') AS event_type,
    value,
    COALESCE(props, '') AS props,
    ROW_NUMBER() OVER (PARTITION BY user_id % {N_CONVS} ORDER BY event_id) AS rn
  FROM events
),
transcripts AS (
  SELECT
    CONCAT('conv_', CAST(conv_n AS STRING)) AS conv_id,
    CAST(rn - 1 AS INT) AS turn_idx,
    CASE WHEN event_id % 3 = 0 THEN 'user'
         WHEN event_id % 3 = 1 THEN 'assistant'
         ELSE 'tool' END AS role,
    CONCAT(event_type, ' turn ', CAST(event_id AS STRING), ' ', props) AS text,
    CASE WHEN event_id % 5 = 0 THEN 'search'
         WHEN event_id % 5 = 1 THEN 'browser'
         WHEN event_id % 5 = 2 THEN 'python'
         ELSE NULL END AS tool,
    CAST({TS_BASE_MS} + 1000 * SUM(1 + (event_id % 13) * 47)
         OVER (PARTITION BY conv_n ORDER BY rn ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS ts_ms,
    CAST(value AS DOUBLE) AS value
  FROM ev
)
"""

# Skew + duplicate-ts fixture (FIXTURES.md F1 spirit): conversation sizes
# ramp ~1..199 per 10k events (conv = floor(sqrt(event_id % 10000))) and
# three turns share each minute-resolution timestamp. Deterministic and
# identical on Spark SQL / DuckDB (FLOOR(SQRT(int)) is exact for perfect
# squares in IEEE doubles).
SKEWED_CTE = f"""
sk_ev AS (
  SELECT event_id, value,
         CAST(FLOOR(SQRT(event_id % 10000)) AS INT) AS conv_n,
         ROW_NUMBER() OVER (
             PARTITION BY CAST(FLOOR(SQRT(event_id % 10000)) AS INT)
             ORDER BY event_id) AS rn
  FROM events
),
skewed AS (
  SELECT CONCAT('s_', CAST(conv_n AS STRING)) AS conv_id,
         CAST(rn - 1 AS INT) AS turn_idx,
         CAST({TS_BASE_MS} + 60000 * CAST(FLOOR((rn - 1) / 3) AS BIGINT)
              AS BIGINT) AS ts_ms,
         CAST(value AS DOUBLE) AS value
  FROM sk_ev
)
"""


def skewed_sql(select: str) -> str:
    return f"WITH {SKEWED_CTE} {select}"


def skewed_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir, "skewed")
    cached = _CACHE.get(key)
    if cached is not None:
        try:
            if not cached.sparkSession.sparkContext._jsc.sc().isStopped():
                return cached
        except Exception:
            pass
        _CACHE.pop(key, None)
    with_testdata_views(spark, sf_dir, ["events"])
    df = spark.sql(skewed_sql("SELECT * FROM skewed")).persist()
    _cache_put(key, df)
    return df


# A point-in-time right table for LAST JOIN: sparse per-conversation "model
# config updates" strictly before some turns (ts shifted back 1500 ms so a
# right row never shares a timestamp with a left row).
UPDATES_CTE = """
updates AS (
  SELECT
    conv_id,
    ts_ms - 1500 AS ts_ms,
    CONCAT('cfg_', CAST(turn_idx AS STRING)) AS cfg,
    value * 10.0 AS weight
  FROM transcripts
  WHERE turn_idx % 7 = 3
)
"""


def with_testdata_views(spark: SparkSession, sf_dir: str, tables=None) -> None:
    """Register the driver parquet tables as temp views."""
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def transcripts_sql(select: str = "SELECT * FROM transcripts") -> str:
    return f"WITH {TRANSCRIPTS_CTE} {select}"


def transcripts_updates_sql(select: str) -> str:
    return f"WITH {TRANSCRIPTS_CTE}, {UPDATES_CTE} {select}"


# (session id, sf_dir) → persisted DataFrame; the derivation runs two
# window functions over events, so repeated queries share one compute.
# Bounded: oldest entries are unpersisted past _CACHE_MAX so long-lived
# sessions / corpus replays don't accumulate executor storage.
_CACHE: dict = {}
_CACHE_MAX = 8


def _cache_put(key, df) -> None:
    while len(_CACHE) >= _CACHE_MAX:
        old_key, old_df = next(iter(_CACHE.items()))
        _CACHE.pop(old_key, None)
        try:
            old_df.unpersist()
        except Exception:
            pass
    _CACHE[key] = df


def clear_cache() -> None:
    """Unpersist and drop every memoized derived table."""
    for df in list(_CACHE.values()):
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript table per input_hint, with both ts (timestamp) and ts_ms.

    Backed by a parquet scan of events; Catalyst prunes the event columns
    actually used, so at 100 TB this reads only the needed columns.
    Memoized per (session, sf_dir) with persist — the analog of the
    materialized Iceberg transcript table the real deployment reads.
    """
    key = (id(spark), sf_dir)
    cached = _CACHE.get(key)
    if cached is not None:
        try:
            if not cached.sparkSession.sparkContext._jsc.sc().isStopped():
                return cached
        except Exception:
            pass
        _CACHE.pop(key, None)
    with_testdata_views(spark, sf_dir, ["events"])
    df = spark.sql(transcripts_sql())
    df = df.withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).persist()
    _cache_put(key, df)
    return df


def updates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATES_CTE applied to the memoized transcripts DataFrame — a
    plain filter+projection over the persisted table, so the two-window
    synthesis is not re-run per query (the oracle side still derives it
    via transcripts_updates_sql; the results are identical by
    construction)."""
    t = transcripts_df(spark, sf_dir)
    return (t.where(F.col("turn_idx") % 7 == 3)
             .select(
                 "conv_id",
                 (F.col("ts_ms") - 1500).alias("ts_ms"),
                 F.concat(F.lit("cfg_"),
                          F.col("turn_idx").cast("string")).alias("cfg"),
                 (F.col("value") * 10.0).alias("weight"))
             .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
