#!/usr/bin/env python
"""Backfill job: full feature-vector computation over the transcript table,
checkpoint-resumable, for spark-submit.

    zip -r /tmp/engine.zip openmldb_spark
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/backfill.py --sf-dir /root/testdata/sf0.1 \
        --ckpt-dir /tmp/backfill_ckpt

On a cluster: same command with --master yarn/k8s and an HDFS/S3
--ckpt-dir; re-running after a failure resumes at the first stage whose
checkpoint fingerprint no longer matches (see jobs/runner.py).

Stages: transcripts → sessionize → window features (kernel tier)
→ as-of join of config updates → final feature table. Emits the stage
ledger (per-partition lineage + metrics) as JSON on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from openmldb_spark.session import get_spark  # noqa: E402
from openmldb_spark.jobs.runner import CheckpointedPipeline  # noqa: E402
from openmldb_spark.plans.specs import (Agg, SessionizeSpec,  # noqa: E402
                                        WindowSpec)
from openmldb_spark.operators.window import window_agg  # noqa: E402
from openmldb_spark.operators.lastjoin import asof_join_kernel  # noqa: E402
from openmldb_spark.operators.sessionize import sessionize  # noqa: E402
from openmldb_spark.transcripts import transcripts_df, updates_df  # noqa: E402

KEY = ["conv_id", "turn_idx"]


def build(pipe: CheckpointedPipeline, sf_dir: str) -> None:
    pipe.stage("transcripts",
               lambda spark: transcripts_df(spark, sf_dir),
               params=sf_dir)
    pipe.stage("updates",
               lambda spark: updates_df(spark, sf_dir).select(
                   "conv_id", "ts_ms", "cfg", "weight"),
               params=sf_dir)
    sess_spec = SessionizeSpec(partition_by=["conv_id"], order_by="ts_ms",
                               gap_ms="5m")
    pipe.stage(
        "sessions",
        lambda spark, t: sessionize(t, sess_spec),
        deps=["transcripts"],
        # fingerprint from the ACTUAL spec: editing gap_ms without
        # remembering a hand-written version bump must invalidate the
        # checkpoint, not resume stale sessions
        params=repr(sess_spec),
    )
    spec = WindowSpec(partition_by=["conv_id"], order_by="ts_ms",
                      frame="rows_range", preceding="30m",
                      tiebreak=("turn_idx",))
    aggs = [Agg("sum", "value", "sum_30m"),
            Agg("count", "value", "cnt_30m"),
            Agg("min", "value", "min_30m"),
            Agg("max", "value", "max_30m"),
            Agg("lag", "value", "prev_value", param=1),
            Agg("top_n_frequency", "tool", "top_tools", param=2)]
    pipe.stage(
        "window_features",
        lambda spark, s: window_agg(
            s, spec, aggs,
            keep_cols=[*KEY, "ts_ms", "role", "session_id"], tier="kernel"),
        deps=["sessions"],
        # same principle: spec + agg list ARE the configuration
        params=f"{spec!r}/{aggs!r}",
    )
    pipe.stage(
        "features",
        lambda spark, w, u: asof_join_kernel(
            w, u, on=["conv_id"], left_ts="ts_ms", right_ts="ts_ms",
            right_cols=["cfg", "weight"]),
        deps=["window_features", "updates"],
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="backfill", master=args.master)
    pipe = CheckpointedPipeline(spark, args.ckpt_dir)
    build(pipe, args.sf_dir)
    out = pipe.run("features")
    n = out.count()
    print(json.dumps({"rows": n, "ledger": pipe.metrics()}))
    spark.stop()


if __name__ == "__main__":
    main()
