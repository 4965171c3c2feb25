"""Round-4 self-review regression tests.

Each test pins one defect found by the round-4 code review of the
round-4 diff itself (5c4c645..HEAD):

1. window_agg must keep ``cond_anchor`` columns in its projection —
   an anchor condition referencing a DIFFERENT column than the row
   side (count_where(id, c1 = lag(c2, 0))) must not crash.
2. Numeric casts of a NULL boolean preserve NULL (the IF-based
   truthiness lowering must not default NULL to 0).
3. parse_insert is quote-aware: string literals containing commas and
   parens round-trip.
4. absandlat/absorlat indexes without a ttl default to the
   reference's 0-bounds rendering instead of crashing.
5. CREATE INDEX with the no-space spelling ``ON t1(c1)`` still
   resolves the table for the duplicate-index check.
6. _lower_nested_sum emits the reference's 0 (not NULL) when the
   frame-constant factor/addend is NULL (sum accumulates nothing —
   SumUdafDef const_init(T(0)), default_udf_library.cc:106-120).
7. Integer window sums accumulate in int64, staying wrap-exact
   (mod 2^N) even when a group's running prefix sum passes 2^53 —
   the float64 prefix path loses low-order bits there.
"""

import numpy as np
import pytest

from openmldb_spark.sqlfe import run_sql
from openmldb_spark.sources import ddl
from openmldb_spark.sources.io import run_statement


def test_cond_anchor_cross_column_survives_projection(spark):
    t = spark.createDataFrame(
        [(1, "a", "a", 1000), (2, "a", "b", 2000), (3, "b", "b", 3000)],
        "id int, c1 string, c2 string, ts bigint")
    r = run_sql(
        spark,
        "select id, count_where(id, c1 = lag(c2, 0)) over w as cw from t "
        "window w as (partition by c2 order by ts "
        "rows between 2 preceding and current row)", {"t": t})
    got = {x.id: x.cw for x in r.collect()}
    # id1: frame {id1}, c1='a' vs anchor c2='a' -> 1
    # id2: frame {id2,id3? no - partition c2} — partition 'b' holds
    #   id2 (c1='a') and id3 (c1='b'); at id2 frame {id2}: 'a' vs 'b' -> 0
    # id3: frame {id2,id3} anchor c2='b': c1 values ('a','b') -> 1
    assert got == {1: 1, 2: 0, 3: 1}


def test_null_boolean_numeric_casts_stay_null(spark):
    t = spark.createDataFrame([(1, True), (2, None), (3, False)],
                              "id int, b boolean")
    r = run_sql(spark, "select id, int16(b) as i16, int32(b) as i32, "
                "int64(b) as i64, double(b) as d from t", {"t": t})
    rows = {x.id: (x.i16, x.i32, x.i64, x.d) for x in r.collect()}
    assert rows[1] == (1, 1, 1, 1.0)
    assert rows[2] == (None, None, None, None)
    assert rows[3] == (0, 0, 0, 0.0)


def test_insert_literals_with_commas_and_parens(spark):
    tables = {}
    run_statement(spark, "create table ti (a string, b int)", tables)
    run_statement(
        spark,
        "insert into ti values ('a,b', 1), ('a)b', 2), ('c(d', 3)",
        tables)
    got = sorted((x.a, x.b) for x in tables["ti"].collect())
    assert got == [("a)b", 2), ("a,b", 1), ("c(d", 3)]


def test_insert_rejects_unbalanced_quotes():
    with pytest.raises(ddl.DdlError):
        ddl.parse_insert("insert into t values ('abc, 1)")


def test_absandlat_without_ttl_defaults_to_zero_bounds(spark):
    spec = ddl.parse_create_table(
        "create table t4 (c1 int, c2 bigint, "
        "index(key=c1, ts=c2, ttl_type=absandlat))")
    assert spec["indexes"][0]["ttl"] == "0min&&0"
    spec = ddl.parse_create_table(
        "create table t5 (c1 int, c2 bigint, "
        "index(key=c1, ts=c2, ttl_type=absorlat))")
    assert spec["indexes"][0]["ttl"] == "0min||0"


def test_create_index_no_space_spelling_dup_check(spark):
    tables, catalog = {}, {}
    run_statement(spark, "create table t1 (c1 int, c2 bigint)",
                  tables, catalog=catalog)
    run_statement(spark, "create index i1 on t1 (c1) options (ts=c2)",
                  tables, catalog=catalog)
    with pytest.raises(ddl.DdlError):
        run_statement(spark, "create index i2 on t1(c1) options (ts=c2)",
                      tables, catalog=catalog)


def test_nested_sum_null_frame_constant_yields_zero(spark):
    t = spark.createDataFrame(
        [(1, 2.0, None, 1000), (1, 3.0, None, 2000)],
        "id int, v double, w double, ts bigint")
    r = run_sql(
        spark,
        "select id, sum(v * min(w)) over win as s, "
        "sum(v + min(w)) over win as s2 from t "
        "window win as (partition by id order by ts "
        "rows between 1 preceding and current row)", {"t": t})
    for x in r.collect():
        assert x.s == 0.0
        assert x.s2 == 0.0


def test_int64_window_sum_exact_past_2_53(spark):
    big = 2 ** 62
    t = spark.createDataFrame(
        [(1, big, 1000), (1, big, 2000), (1, big, 3000)],
        "id int, v bigint, ts bigint")
    r = run_sql(spark, "select sum(v) over w as s from t "
                "window w as (partition by id order by ts "
                "rows between 2 preceding and current row)", {"t": t})
    got = sorted(x.s for x in r.collect())
    with np.errstate(over="ignore"):
        exp = sorted(int(np.int64(big) * np.int64(k)) for k in (1, 2, 3))
    assert got == exp


def test_int32_wrap_with_nulls_still_reference_exact(spark):
    t = spark.createDataFrame(
        [(1, 2 ** 31 - 1, 1000), (1, 5, 2000), (1, None, 3000)],
        "id int, v int, ts bigint")
    r = run_sql(spark, "select sum(v) over w as s from t "
                "window w as (partition by id order by ts "
                "rows between 2 preceding and current row)", {"t": t})
    got = sorted(x.s for x in r.collect())
    # 2147483647; +5 wraps to -2147483644; null adds nothing
    assert got == [-2147483644, -2147483644, 2147483647]
