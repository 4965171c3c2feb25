"""Warm-floor performance canaries (round-5 task: VERDICT.md r4 #2).

plan_stats (exchange/sort/Python-stage counts) is blind to constant-factor
regressions inside a map stage — round 4 shipped a ~7x MinHash
signature-stage slowdown (a filter that defeated runtime subexpression
sharing) with an essentially unchanged optimized plan, so nothing in the
suite caught it. These canaries warm-run the hot families and assert a
generous fixed ceiling over a recorded floor, so a constant-factor
regression fails the suite instead of landing silently.

Method: one untimed warm-up run, then MIN of N timed runs (min is the
noise-robust floor estimator — any single run can be slow under load,
but the min can only be slow if the code itself is). Ceilings are >= 2.3x
the floor recorded on the round-5 build; re-record floors here if the
operator's algorithm deliberately changes.

Floors recorded 2026-08-21 under the pytest session config (local[4],
shuffle_partitions=4):
  - minhash signature stage, forced via noop write, sf0.1:   ~1.9 s
    (with the round-4 in-chain filter re-introduced: 7-8 s — this is
    the test that MUST fail if that filter comes back)
  - minhash_lsh_pairs end-to-end, sf0.01:                    ~1.1 s
  - flagship window_rows_range, sf0.01:                      ~0.7 s
  - simhash_near_pairs, sf0.01:                              ~0.9 s
"""

import os
import time

import pytest

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def _floor(fn, runs: int = 3) -> float:
    fn()                      # warm-up: JIT/codegen/file-listing caches
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


@pytest.mark.skipif(not os.path.isdir(SF1), reason="sf0.1 testdata absent")
def test_minhash_signature_stage_warm_floor(spark):
    """The map stage whose 7x regression shipped in round 4: forced
    evaluation of the 8 array_min(transform(...)) signature columns.
    Ceiling 4.5s vs ~1.9s floor; the regressed form runs 7-8s here."""
    import pyspark.sql.functions as F  # noqa: F401
    from openmldb_spark.pipeline.dedup import (ensure_parallelism,
                                               minhash_signatures)
    d = spark.read.parquet(f"{SF1}/documents.parquet")

    def run():
        minhash_signatures(ensure_parallelism(d), "text", "doc_id",
                           8, 3, "md5") \
            .write.mode("overwrite").format("noop").save()

    assert _floor(run) < 4.5


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.01 testdata absent")
def test_minhash_lsh_pairs_warm_floor(spark):
    from openmldb_spark.queries import QUERIES

    def run():
        QUERIES["minhash_lsh_pairs"](spark, SF01).count()

    assert _floor(run) < 3.5


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.01 testdata absent")
def test_flagship_window_warm_floor(spark):
    from openmldb_spark.queries import QUERIES

    def run():
        QUERIES["window_rows_range"](spark, SF01).count()

    assert _floor(run) < 2.1


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.01 testdata absent")
def test_simhash_near_pairs_warm_floor(spark):
    from openmldb_spark.queries import QUERIES

    def run():
        QUERIES["simhash_near_pairs"](spark, SF01).count()

    assert _floor(run) < 2.8
