"""Checkpoint-resume runner: resume skips fingerprint-matched stages;
edits invalidate exactly the downstream cone; lineage is recorded."""

import json
import os

import pyspark.sql.functions as F

from openmldb_spark.jobs.runner import CheckpointedPipeline


def _build(pipe, sf_dir, filter_version="1"):
    pipe.stage("src", lambda spark: spark.read.parquet(
        f"{sf_dir}/nation.parquet"), params=sf_dir)
    pipe.stage(
        "filtered",
        lambda spark, s: s.where(F.col("n_regionkey") >= 1),
        deps=["src"], version=filter_version,
    )
    pipe.stage(
        "agg",
        lambda spark, f: f.groupBy("n_regionkey").agg(
            F.count(F.lit(1)).alias("n")),
        deps=["filtered"],
    )


def test_checkpoint_resume_and_invalidation(spark, sf_dir, tmp_path):
    ck = str(tmp_path / "ckpt")

    p1 = CheckpointedPipeline(spark, ck)
    _build(p1, sf_dir)
    out1 = p1.run("agg").orderBy("n_regionkey").collect()
    assert [e["action"] for e in p1.metrics()] == ["computed"] * 3

    # second run: everything resumed from parquet
    p2 = CheckpointedPipeline(spark, ck)
    _build(p2, sf_dir)
    out2 = p2.run("agg").orderBy("n_regionkey").collect()
    assert out1 == out2
    assert [e["action"] for e in p2.metrics()] == ["resumed"] * 3

    # bump the middle stage: src resumes, filtered+agg recompute
    p3 = CheckpointedPipeline(spark, ck)
    _build(p3, sf_dir, filter_version="2")
    p3.run("agg")
    actions = {e["stage"]: e["action"] for e in p3.metrics()}
    assert actions == {"src": "resumed", "filtered": "computed",
                       "agg": "computed"}

    # manifest carries per-partition lineage + metrics + conf
    with open(os.path.join(ck, "agg", "manifest.json")) as f:
        man = json.load(f)
    assert man["rows"] == sum(p["rows"] for p in man["partitions"])
    assert man["n_partitions"] >= 1
    assert man["bytes"] > 0          # checkpoint size on the ckpt FS
    assert man["duration_sec"] >= 0
    assert "spark.sql.shuffle.partitions" in man["spark_conf"]
    assert man["deps"]["filtered"]


def test_backfill_job_stages(spark, sf_dir, tmp_path):
    """The spark-submit backfill job end to end (in-process)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "backfill",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jobs", "backfill.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ck = str(tmp_path / "bf")
    pipe = CheckpointedPipeline(spark, ck)
    mod.build(pipe, sf_dir)
    out = pipe.run("features")
    cols = set(out.columns)
    assert {"conv_id", "turn_idx", "session_id", "sum_30m", "top_tools",
            "cfg", "weight"} <= cols
    n = out.count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # resume is a no-op pass
    pipe2 = CheckpointedPipeline(spark, ck)
    mod.build(pipe2, sf_dir)
    pipe2.run("features")
    assert all(e["action"] == "resumed" for e in pipe2.metrics())
