"""Late-round-4 self-review regression tests (review of 68f21c4..HEAD).

Each test pins one finding from that pass:
1. db-qualified CREATE TABLE / INSERT / CREATE INDEX route to the
   NAMED database, not the current one (and an unknown db errors).
2. SET GLOBAL of an unknown key lands only in the global store, never
   in SHOW (session) VARIABLES; a failed typed SET still writes the
   global store first (pinned in test_cmd_corpus).
3. table_meta never crashes on non-scalar column types (array columns
   from registered parquet tables render as their simpleString).
4. inline CREATE TABLE indexes get generated names and are droppable.
5. CONFIG(...) stripping is string-masked and quote-aware.
6. connected_components raises on a non-converged edge set instead of
   returning silently wrong labels.
"""

import pytest

from openmldb_spark.pipeline.cluster import connected_components
from openmldb_spark.sources.ddl import DdlError
from openmldb_spark.sources.io import _strip_config_clauses
from openmldb_spark.sources.session import Session


# -- 1. db-qualified statement routing --------------------------------------

def test_db_qualified_create_routes_to_named_db(spark):
    s = Session(spark, db="db2")
    s.create_database("db1")
    s.execute("create table db1.t1 (a int, b timestamp)")
    assert "t1" in s._dbs["db1"]          # landed in db1, unqualified
    assert "db1.t1" not in s._dbs["db2"]  # NOT a dotted key in db2
    s.execute('insert into db1.t1 values (5, 1590738989000)')
    assert s.table("t1", db="db1").count() == 1
    s.execute("create index idx1 on db1.t1 (a) options (ts=b)")
    assert any(e.get("name") == "idx1" for e in s._catalogs["db1"]["t1"])
    # the current database is untouched throughout
    assert s._dbs["db2"] == {}


def test_db_qualified_create_unknown_db_errors(spark):
    s = Session(spark, db="main")
    with pytest.raises(DdlError, match="database not found"):
        s.execute("create table nodb.t1 (a int)")


# -- 3. table_meta on exotic column types ------------------------------------

def test_table_meta_tolerates_array_columns(spark):
    s = Session(spark, db="main")
    df = spark.createDataFrame([("d1", [0.1, 0.2])],
                               "doc_id string, emb array<double>")
    s.register("embeddings", df)
    meta = s.table_meta("embeddings")
    types = {c["name"]: c["type"] for c in meta["column_desc"]}
    assert types == {"doc_id": "varchar", "emb": "array<double>"}
    assert len(s.list_table_metas()) == 1   # the listing survives too


# -- 4. inline indexes are droppable -----------------------------------------

def test_inline_index_has_generated_name_and_drops(spark):
    s = Session(spark, db="main")
    s.execute("create table t (c1 int, c2 timestamp, "
              "index(key=c1, ts=c2))")
    entries = s._catalogs["main"]["t"]
    assert entries[0]["name"] == "INDEX_0"
    s.execute("drop index t.INDEX_0")
    assert s._catalogs["main"]["t"] == []


# -- 5. CONFIG strip edges ----------------------------------------------------

def test_config_strip_leaves_quoted_paths_alone():
    sql = "SELECT * FROM t INTO OUTFILE '/data/config(1)/out.csv'"
    assert _strip_config_clauses(sql) == sql


def test_config_strip_quote_aware_body():
    sql = ("LOAD DATA INFILE '/x.csv' INTO TABLE t "
           "CONFIG(spark=\"a)b\", job='online')")
    assert _strip_config_clauses(sql) == \
        "LOAD DATA INFILE '/x.csv' INTO TABLE t"


def test_config_strip_still_strips_plain_clause():
    sql = "SELECT * FROM t INTO OUTFILE '/o.csv' CONFIG(job='online')"
    assert _strip_config_clauses(sql) == \
        "SELECT * FROM t INTO OUTFILE '/o.csv'"


# -- 6. connected_components non-convergence ---------------------------------

def test_cc_raises_when_fixed_point_not_reached(spark):
    # an 8-node path graph cannot star-collapse in one alternation round
    pairs = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(7)],
        "id_a string, id_b string")
    with pytest.raises(RuntimeError, match="fixed point"):
        connected_components(pairs, max_iter=1)
    # and with room to converge the labels are the path's single root
    out = connected_components(pairs, max_iter=25)
    comps = {r.component for r in out.collect()}
    assert comps == {"n0"}


# -- 6b. procedures carry their database --------------------------------------

def test_show_procedures_renders_db(spark):
    s = Session(spark, db="dbp")
    s.execute("create table t1 (c1 int, c7 timestamp)")
    s.execute("create procedure p1 (c1 int, c7 timestamp) "
              "begin select * from t1; end")
    rows = [tuple(r) for r in s.execute("show procedures").collect()]
    assert rows == [("dbp", "p1")]
    with pytest.raises(DdlError, match="does not exist"):
        s.execute("show create procedure otherdb.p1")
    out = s.execute("show create procedure dbp.p1").collect()
    assert out[0].Procedure == "p1"
