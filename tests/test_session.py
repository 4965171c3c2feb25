"""Session (sources/session.py): the reference CLI/SDK command surface
— CREATE/USE/DROP DATABASE, SHOW DATABASES/TABLES, DROP TABLE/INDEX —
with the nameserver's exact refusal semantics
(name_server_impl.cc:9596,9659-9674), plus end-to-end delegation:
statements scope to the USE'd database, queries resolve bare and
``db.table`` names across databases (multiple_databases parity), and
the restful show-databases corpus shapes
(cases/restful/v230/test_show_databases.yaml: 0/1/2-database listings)
hold.
"""

import pytest

from openmldb_spark.sources.ddl import DdlError
from openmldb_spark.sources.session import Session


@pytest.fixture()
def sess(spark):
    return Session(spark, db="test_zw")


def _names(df):
    return [r[0] for r in df.collect()]


def test_show_databases_0_1_2(spark):
    s = Session(spark)
    assert _names(s.execute("SHOW DATABASES")) == []
    s.execute("create database test1;")
    assert _names(s.execute("show databases")) == ["test1"]
    s.execute("CREATE DATABASE test2")
    assert _names(s.execute("SHOW DATABASES;")) == ["test1", "test2"]


def test_create_database_dup_and_if_not_exists(sess):
    with pytest.raises(DdlError, match="database already exists"):
        sess.execute("create database test_zw")
    sess.execute("create database if not exists test_zw")  # tolerated


def test_use_unknown_database(sess):
    with pytest.raises(DdlError, match="database not found"):
        sess.execute("USE nope")


def test_drop_database_semantics(sess):
    with pytest.raises(DdlError, match="database not found"):
        sess.execute("drop database nope")
    sess.execute("drop database if exists nope")  # tolerated
    sess.execute("create database d2")
    sess.execute("use d2")
    sess.execute("create table t1 (c1 string, c2 int)")
    with pytest.raises(DdlError, match="database not empty"):
        sess.execute("drop database d2")
    sess.execute("drop table t1")
    sess.execute("drop database d2")
    assert sess.db is None  # current db dropped → no selection
    with pytest.raises(DdlError, match="no database selected"):
        sess.execute("show tables")


def test_tables_scope_to_current_db(sess):
    sess.execute("create table t1 (c1 string, c2 int)")
    sess.execute("insert into t1 values ('a', 1), ('b', 2)")
    assert _names(sess.execute("show tables")) == ["t1"]
    sess.execute("create database other")
    sess.execute("use other")
    assert _names(sess.execute("show tables")) == []
    # bare name resolves in the CURRENT db only
    with pytest.raises(Exception):
        sess.execute("select c1 from t1").collect()
    # dotted name reaches across databases
    got = sess.execute("select c1, c2 from test_zw.t1")
    assert sorted((r.c1, r.c2) for r in got.collect()) == \
        [("a", 1), ("b", 2)]
    sess.execute("use test_zw")
    got = sess.execute("select sum(c2) as s from t1 group by c1")
    assert sorted(r.s for r in got.collect()) == [1, 2]


def test_drop_table(sess):
    with pytest.raises(DdlError, match="does not exist"):
        sess.execute("drop table missing")
    sess.execute("drop table if exists missing")  # tolerated
    sess.execute("create table t9 (c1 string)")
    sess.execute("drop table test_zw.t9")
    assert _names(sess.execute("show tables")) == []


def test_drop_index(sess):
    sess.execute("create table t1 (c1 string, c2 int, c7 timestamp)")
    sess.execute("create index index1 on t1 (c1) "
                 "options (ts=c7, ttl=100m, ttl_type=absolute)")
    cat = sess._catalogs["test_zw"]["t1"]
    # entry 0 = the CREATE TABLE default first-column index; inline /
    # default indexes get generated INDEX_<pos> names so DROP INDEX can
    # address them (node_adapter.cc:178-182 names them
    # INDEX_<pos>_<unixtime>; the time suffix is dropped for
    # determinism)
    assert [e.get("name") for e in cat] == ["INDEX_0", "index1"]
    with pytest.raises(DdlError, match="does not exist"):
        sess.execute("drop index t1.nope")
    sess.execute("drop index t1.index1")
    assert [e.get("name") for e in sess._catalogs["test_zw"]["t1"]] == \
        ["INDEX_0"]


def test_register_and_query_parquet_table(spark):
    s = Session(spark, db="prod")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s.register("documents", docs)
    n = s.execute("select count(*) as n from documents").collect()[0].n
    assert n == docs.count()


def test_explain(sess):
    sess.execute("create table t1 (c1 string, c2 int)")
    sess.execute("insert into t1 values ('a', 1)")
    out = sess.execute("EXPLAIN select c1, sum(c2) as s from t1 "
                       "group by c1").collect()
    assert len(out) == 1 and "Physical Plan" in out[0].plan


def test_load_data_db_qualified_target(sess, tmp_path):
    sess.execute("create database db0")
    sess._dbs["db0"]["t2"] = sess.spark.createDataFrame(
        [], "col1 int, c1 string")
    csv = tmp_path / "in.csv"
    csv.write_text("col1,c1\n5,x\n7,y\n")
    sess.execute(f"LOAD DATA INFILE '{csv}' INTO TABLE db0.t2 "
                 f"OPTIONS (header = true)")
    assert sess._dbs["db0"]["t2"].count() == 2
