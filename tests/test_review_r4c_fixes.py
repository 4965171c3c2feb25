"""Regression pins for the third round-4 review pass (DDL / procedure /
restful statement surfaces)."""

import pytest

from openmldb_spark.sources.ddl import (DdlError, create_table,
                                        insert_into, parse_create_table,
                                        parse_insert)


def test_create_table_default_literal_with_comma_and_paren(spark):
    # quote-blind body scanners split/truncated inside DEFAULT literals
    spec = parse_create_table(
        "create table t1 (c1 string default 'a,b', c2 int)")
    assert [f.name for f in spec["schema"].fields] == ["c1", "c2"]
    assert spec["defaults"]["c1"] == "a,b"
    spec = parse_create_table(
        "create table t1 (c1 string default 'a)b', c2 int)")
    assert spec["defaults"]["c1"] == "a)b"


def test_malformed_date_timestamp_literals_raise_ddlerror(spark):
    spark.sql("select 1")  # ensure session
    tables = {}
    name, df = create_table(spark, "create table t (c1 timestamp)")
    tables[name] = df
    with pytest.raises(DdlError, match="invalid timestamp"):
        insert_into(spark, "insert into t values ('not-a-date')", tables)
    name, df = create_table(spark, "create table d (c1 date)")
    tables[name] = df
    for bad in ("'2020-13-45'", "'2020'", "'a-b-c'"):
        with pytest.raises(DdlError, match="invalid date"):
            insert_into(spark, f"insert into d values ({bad})", tables)
    with pytest.raises(DdlError, match="invalid timestamp"):
        insert_into(spark,
                    "insert into t values (99999999999999999999)", tables)


def test_explicitly_empty_index_key_rejected_keyless_index_ok(spark):
    from openmldb_spark.sources.ddl import validate_create_index
    # keyless table-level index auto-keys (test_create.yaml id 14)
    spec = parse_create_table(
        "create table t (c1 string, c4 timestamp, index(ts=c4,ttl=0m))")
    assert spec["indexes"]
    # an explicitly empty CREATE INDEX column list is rejected
    name, df = create_table(spark, "create table ti (c1 string, c2 timestamp)")
    with pytest.raises(DdlError, match="no key column"):
        validate_create_index("create index i1 on ti ()", {"ti": df})


def test_duplicate_insert_column_rejected(spark):
    tables = {}
    name, df = create_table(spark, "create table t (c1 int, c2 int)")
    tables[name] = df
    with pytest.raises(DdlError, match="duplicate column"):
        insert_into(spark, "insert into t (c1, c1) values (1, 2)", tables)


def test_multi_row_prepared_insert_binds_sequentially(spark):
    tables = {}
    name, df = create_table(spark, "create table t (c1 int, c2 int)")
    tables[name] = df
    _, out = insert_into(spark, "insert into t values (?,?),(?,?)",
                         tables, params=(1, 2, 3, 4))
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, 2), (3, 4)]
    with pytest.raises(DdlError, match="not enough parameters"):
        insert_into(spark, "insert into t values (?,?),(?,?)", tables,
                    params=(1, 2))
    with pytest.raises(DdlError, match="too many parameters"):
        insert_into(spark, "insert into t values (?,?)", tables,
                    params=(1, 2, 3))


def test_garbage_between_values_rows_rejected():
    with pytest.raises(DdlError, match="between INSERT VALUES rows"):
        parse_insert("insert into t values (1) garbage (2)")


def test_create_table_if_not_exists_api_no_op(spark):
    tables = {}
    name, df = create_table(spark, "create table t (c1 int)")
    tables[name] = df
    # bound name + IF NOT EXISTS = no-op returning the bound frame
    name2, df2 = create_table(
        spark, "create table if not exists t (c1 int)", tables)
    assert name2 == name and df2 is df
    with pytest.raises(DdlError, match="already exists"):
        create_table(spark, "create table t (c1 int)", tables)


def test_table_less_procedure_executes(spark):
    from openmldb_spark.sources.procedure import (create_procedure,
                                                  execute_procedure)
    procedures, tables = {}, {}
    create_procedure(
        spark, "create procedure p_notab() begin select 1 as one; end;",
        tables, procedures)
    out = execute_procedure(spark, "p_notab", procedures, tables, [])
    assert [tuple(r) for r in out.collect()] == [(1,)]


def test_const_arg_procedure_callable_with_full_rows(spark):
    """The SDK callproc shape: const values inline in the full row (no
    separate common_cols) must bind, not raise."""
    from openmldb_spark.sources.procedure import (create_procedure,
                                                  execute_procedure)
    name, df = create_table(
        spark, "create table tp (c1 string, c2 int, c3 timestamp)")
    # seed a stored row so the request table exists with history
    tables = {name: df}
    procedures = {}
    create_procedure(
        spark,
        "create procedure sp (const c1 string, c2 int, c3 timestamp) "
        "begin select c1, c2 from tp; end;",
        tables, procedures)
    out = execute_procedure(
        spark, "sp", procedures, tables,
        [["k1", 7, 1_600_000_000_000]])     # FULL row, consts inline
    assert [tuple(r) for r in out.collect()] == [("k1", 7)]
    # the restful shape (split common_cols) still works
    out2 = execute_procedure(
        spark, "sp", procedures, tables, [[7, 1_600_000_000_000]],
        common_cols=["k1"])
    assert [tuple(r) for r in out2.collect()] == [("k1", 7)]


def test_restful_put_rejects_nan_json(spark):
    from openmldb_spark.sources.restful import RestfulError, put_table_row
    name, df = create_table(spark, "create table tn (c1 string, c2 double)")
    dbs = {"db1": {name: df}}
    with pytest.raises(RestfulError, match="error code: 3"):
        put_table_row(spark, "PUT", "/dbs/db1/tables/tn",
                      '{"value": [["k", NaN]]}', dbs)
