"""Benchmark harness — headline feature queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...,
   "cores": N}

Each query is forced with a count() (no driver-side collect of payloads).
Scaling-efficiency evidence (north rule): run twice, e.g.
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare turns_per_sec (see BASELINE.md measurement protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openmldb_spark.session import get_spark  # noqa: E402
from openmldb_spark.queries import QUERIES  # noqa: E402

# Headline set: the operators that define the engine (window kernel,
# union backfill, as-of join, sessionization, frame UDAFs) plus the pure
# built-in paths for contrast.
HEADLINE = [
    "window_rows_range",
    "window_rows",
    "window_builtin_tier",
    "window_maxsize",
    "window_exclude_current_time",
    "window_union",
    "window_split",
    "window_skewed_ties",
    "request_mode",
    "last_join",
    "asof_join",
    "sessionize",
    "session_stats",
    "lag_lead",
    "topn_frequency_window",
    "count_cate_window",
    "groupby_agg",
    "join_agg",
    "scalar_funcs",
    "dedup_exact",
    "minhash_lsh_pairs",
    "minhash_lsh_fast",
    "text_stats",
    "doc_fingerprint",
    "ann_cosine_topk",
    "simhash_near_pairs",
    # round 2 additions: SQL front end end-to-end, certified LSH scale
    # path, vectorized multimodal decode
    "sql_group_having",
    "sql_window_expr",
    # round 3: production-script shape (windowed sub-select LAST JOINed
    # to a LAST JOIN chain) end-to-end through the SQL front end, and
    # batch-request mode (request rows vs stored history) through it
    "sql_prod_pipeline",
    "sql_batch_request",
    "embedding_near_dups_lsh",
    "multimodal_features",
    # round 4: reference comparison-coercion semantics (lexical
    # string-mixed compares), nested aggregates in sum (algebraic
    # lowering), anchor-relative count_where (kernel cond_anchor)
    "string_cmp_coercion",
    "window_nested_agg",
    "window_anchor_count_where",
    "ann_ivf_topk",
    # round 4 late: duplicate-cluster labeling (large-star/small-star
    # connected components over near-dup pairs)
    "dedup_clusters",
]


_PY_STAGES = ("FlatMapGroupsInPandas", "MapInPandas",
              "FlatMapCoGroupsInPandas", "ArrowEvalPython",
              "BatchEvalPython")


def plan_stats(df) -> dict:
    """Mechanical shuffle-regression guard: count plan nodes that matter
    at scale (shuffle exchanges, broadcasts, Python stages, sorts) so a
    round-over-round diff of BENCH_r{N}.json catches an accidental extra
    exchange without eyeballing explain output."""
    import re
    s = df._jdf.queryExecution().executedPlan().toString()
    # the plan string nests the CACHED transcript-synthesis build plan
    # under every InMemoryRelation node; those exchanges run once at
    # warm-up, not per query — counting them would report a 5-exchange
    # "shape" for a one-exchange kernel. Keep only nodes outside the
    # cached subtree (deeper-indented lines after an InMemoryRelation).
    def _depth(ln):
        # tree depth = column where the node text starts (first char
        # that isn't tree drawing). Plain leading-space indentation is
        # unusable (branch ':' columns equalize it), and node markers
        # alone miss marker-less lines (ResultQueryStage, == Final
        # Plan ==) that AQE prints inside an executed cached subtree.
        stripped = ln.lstrip(" :+|-")
        return len(ln) - len(stripped)

    # Also dropped: an executed AdaptiveSparkPlan prints "== Final
    # Plan ==" AND "== Initial Plan ==" — counting both doubles every
    # node, so the Initial section (same depth as its children) is cut.
    kept, skip = [], None
    for ln in s.splitlines():
        d = _depth(ln)
        if skip is not None:
            sd, include_equal = skip
            if d > sd or (include_equal and d >= sd):
                continue
            skip = None
        if "== Initial Plan ==" in ln:
            skip = (d, True)
            continue
        if "InMemoryRelation" in ln:
            skip = (d, False)
        kept.append(ln)
    s = "\n".join(kept)
    return {
        "exchanges": len(re.findall(
            r"(?i)Exchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition|roundrobinpartitioning)", s)),
        "broadcasts": s.count("BroadcastExchange"),
        "python_stages": sum(s.count(k) for k in _PY_STAGES),
        "sorts": len(re.findall(r"\bSort \[", s)),
    }


def _safe_float(sf: str):
    try:
        return float(sf)
    except ValueError:
        return sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-2 per query by default: host-level noise on this shared VM
    # inflates individual doc-table queries 3-7x within a single run
    # (BASELINE.md protocol) — a second pass isolates compute cost
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    spark = get_spark(app_name="openmldb-spark-bench")

    # warm-up: JVM + Python worker pool + parquet footer cache — also
    # touch the documents/embeddings tables so the pipeline-family
    # queries measure compute, not first-touch page-cache fills
    QUERIES["window_rows_range"](spark, sf_dir).count()
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    times: dict[str, float] = {}
    stats: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            # a renamed/typo'd headline entry must show in the record,
            # not silently vanish from the round-over-round diff
            errors[name] = "headline name not in QUERIES"
            continue
        best = float("inf")
        try:
            for _ in range(max(1, runs)):
                t0 = time.monotonic()
                df = QUERIES[name](spark, sf_dir)
                df.count()
                best = min(best, time.monotonic() - t0)
            times[name] = round(best, 3)
            stats[name] = plan_stats(df)
        except Exception as e:  # one bad query must not sink the record
            errors[name] = str(e)[:200]

    total = round(sum(times.values()), 3)
    # Headline throughput = n_turns / MEDIAN of the kernel-window family
    # (same Arrow-kernel topology over the same events table). A single
    # flagship sample is hostage to host noise — round 3's official
    # record undersold the engine 1.8x because both best-of-2 samples of
    # one query landed in the same noise window; the family median is
    # robust to any one noisy query.
    kernel_family = [times[q] for q in (
        "window_rows_range", "window_rows", "window_maxsize",
        "window_exclude_current_time") if q in times]
    if kernel_family:
        import statistics
        median_t = statistics.median(kernel_family)
        turns_per_sec = round(n_turns / median_t, 1)
    else:
        turns_per_sec = None
    flagship = times.get("window_rows_range", float("nan"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    rec = {
        "metric": "headline feature queries wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _safe_float(sf),
        "turns": n_turns,
        "turns_per_sec": turns_per_sec,
        "turns_per_sec_basis": "median of kernel-window family",
        "flagship_sec": flagship if flagship == flagship else None,
        "cores": cpus,
        "runs_per_query": runs,
    }
    if errors:
        rec["errors"] = errors
    # plan_stats goes on its OWN earlier line: round 2's record was
    # truncated because the combined line overflowed the driver's
    # 2000-char tail capture — the compact timings record must be the
    # final stdout line
    print(json.dumps({"plan_stats": stats}))
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
