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
    assert first.storageLevel.useMemory is False    # unpersisted
