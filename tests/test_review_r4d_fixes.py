"""Regression pins for the fourth round-4 review pass (dbapi,
dedup/multimodal pipeline)."""

import pytest
import pyspark.sql.functions as F


def test_dedup_exact_null_safe_digest(spark):
    """(NULL,'x') vs ('x',NULL) and (NULL,NULL) vs ('','') are DISTINCT
    key tuples — concat_ws dropping NULLs used to merge them."""
    from openmldb_spark.pipeline.dedup import dedup_exact
    df = spark.createDataFrame(
        [(1, None, "x"), (2, "x", None), (3, None, None), (4, "", "")],
        "doc_id long, a string, b string")
    out = dedup_exact(df, ["a", "b"], "doc_id").collect()
    assert len(out) == 4                       # four distinct tuples
    assert all(r.dup_cnt == 1 for r in out)


def test_minhash_short_docs_excluded_from_banding(spark):
    """Docs with no shingles must not share one NULL-signature bucket
    (quadratic candidate blowup at scale); pairs among them are never
    emitted anyway."""
    from openmldb_spark.pipeline.dedup import minhash_lsh_pairs
    rows = [(i, "ab") for i in range(30)]          # too short to shingle
    rows += [(100, "the quick brown fox jumps over the lazy dog"),
             (101, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.4).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(100, 101)}


def test_multimodal_null_meta_fields_do_not_crash(spark):
    from openmldb_spark.pipeline.multimodal import _meta_int
    assert _meta_int(None, "width", 8) == 8
    assert _meta_int({"width": None}, "width", 8) == 8
    assert _meta_int({"width": 16}, "width", 8) == 16
    assert _meta_int({"width": float("nan")}, "width", 8) == 8


def test_dbapi_string_question_mark_binds_correctly(spark):
    """A '?' inside a string literal must be neither a hole nor counted
    for arity."""
    from openmldb_spark.dbapi import connect
    db = connect("qdb", spark=spark)
    cur = db.cursor()
    cur.execute("create table tq (c1 string, c2 string)")
    cur.execute("insert into tq values ('n/a?', ?)", ("v2",))
    rows = cur.execute("select * from tq").fetchall()
    assert rows == [("n/a?", "v2")]


def test_dbapi_command_clears_previous_result_set(spark):
    from openmldb_spark.dbapi import DatabaseError, connect
    db = connect("cdb", spark=spark)
    cur = db.cursor()
    cur.execute("create table tc (a int)")
    cur.execute("insert into tc values (1)")
    assert cur.execute("select * from tc").fetchall() == [(1,)]
    cur.execute("create table td (b int)")       # command: clears rows
    with pytest.raises(DatabaseError):
        cur.fetchall()
    assert cur.description is None


def test_dbapi_executemany_batches_multirow(spark):
    from openmldb_spark.dbapi import connect
    db = connect("bdb", spark=spark)
    cur = db.cursor()
    cur.execute("create table tb (a int, b string)")
    cur.executemany("insert into tb values (?, ?)",
                    [(i, f"s{i}") for i in range(7)], batch_number=3)
    rows = sorted(cur.execute("select * from tb").fetchall())
    assert rows == [(i, f"s{i}") for i in range(7)]


def test_dbapi_fetchone_checks_closed(spark):
    from openmldb_spark.dbapi import CursorClosedException, connect
    db = connect("fdb", spark=spark)
    cur = db.cursor()
    cur.execute("create table tf (a int)")
    cur.execute("insert into tf values (1)")
    cur.execute("select * from tf")
    cur.close()
    with pytest.raises(CursorClosedException):
        cur.fetchone()


def test_simhash_cache_bounded_to_one_table(spark):
    """One cached signature table per session — and, critically, the
    LIVE one stays cached. Spark's CacheManager keys entries by plan
    equality, so the round-4 order (persist new, then unpersist prev)
    uncached the brand-new table whenever the same input was passed
    twice; round 5 unpersists the previous entry first."""
    from openmldb_spark.pipeline import dedup
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat")],
        "doc_id long, text string")
    dedup.simhash_near_pairs(df, "text", "doc_id").collect()
    first = dedup._SIMHASH_CACHE[id(spark)]
    dedup.simhash_near_pairs(df, "text", "doc_id").collect()
    second = dedup._SIMHASH_CACHE[id(spark)]
    assert second is not first
    # the current entry IS cached (equal-plan repeat: the old ordering
    # left this False, silently recomputing the UDF per join side)
    assert second.storageLevel.useMemory is True
    second.unpersist()                              # leave the session clean


# ----------------------------------------------------------- lastjoin.py

def test_asof_kernel_null_timestamps_unmatched_not_crash(spark):
    from openmldb_spark.operators.lastjoin import asof_join_kernel
    left = spark.createDataFrame(
        [("c", 1000, 1), ("c", None, 2), ("c", 3000, 3)],
        "k string, ts_ms long, lid int")
    right = spark.createDataFrame(
        [("c", 500, "a"), ("c", None, "zz"), ("c", 2500, "b")],
        "k string, ts_ms long, cfg string")
    got = {r.lid: r.cfg for r in asof_join_kernel(
        left, right, on=["k"]).collect()}
    # null-ts left row unmatched; null-ts right row never matches
    assert got == {1: "a", 2: None, 3: "b"}


def test_asof_kernel_rejects_colliding_right_cols(spark):
    from openmldb_spark.operators.lastjoin import asof_join_kernel
    left = spark.createDataFrame([("c", 1000, "x")],
                                 "k string, ts_ms long, status string")
    right = spark.createDataFrame([("c", 500, "y")],
                                  "k string, ts_ms long, status string")
    with pytest.raises(ValueError, match="collide with left"):
        asof_join_kernel(left, right, on=["k"], right_cols=["status"])


def test_asof_kernel_duplicate_ts_pick_deterministic(spark):
    from openmldb_spark.operators.lastjoin import asof_join_kernel
    left = spark.createDataFrame([("c", 1000, 1)],
                                 "k string, ts_ms long, lid int")
    right = spark.createDataFrame(
        [("c", 500, "a"), ("c", 500, "z"), ("c", 500, "m")],
        "k string, ts_ms long, cfg string")
    for _ in range(3):
        got = asof_join_kernel(left, right, on=["k"]).collect()
        assert got[0].cfg == "z"        # max value tuple, every run


def test_last_join_key_arity_and_empty_keys_raise(spark):
    from openmldb_spark.operators.lastjoin import last_join
    from openmldb_spark.plans.specs import LastJoinSpec
    df = spark.createDataFrame([("c", 1)], "k string, v int")
    with pytest.raises(ValueError, match="left_on must name"):
        last_join(df, df, LastJoinSpec(left_on=[]))
    with pytest.raises(ValueError, match="keys but right_on"):
        last_join(df, df, LastJoinSpec(left_on=["k", "v"],
                                       right_on=["k"]))


def test_last_join_unordered_no_tiebreak_deterministic(spark):
    from openmldb_spark.operators.lastjoin import last_join
    from openmldb_spark.plans.specs import LastJoinSpec
    left = spark.createDataFrame([("c", 1)], "k string, lid int")
    right = spark.createDataFrame(
        [("c", "a"), ("c", "z"), ("c", "m")], "k string, cfg string")
    for _ in range(3):
        got = last_join(left, right, LastJoinSpec(left_on=["k"])).collect()
        assert got[0].cfg == "z"        # pinned on right value columns


def test_last_join_explicit_empty_right_cols_respected(spark):
    from openmldb_spark.operators.lastjoin import last_join
    from openmldb_spark.plans.specs import LastJoinSpec
    left = spark.createDataFrame([("c", 1)], "k string, lid int")
    right = spark.createDataFrame([("c", 2, 99)],
                                  "k string, ts_ms long, extra int")
    out = last_join(left, right,
                    LastJoinSpec(left_on=["k"], order_by="ts_ms"),
                    right_cols=[])
    assert out.columns == ["k", "lid"]
