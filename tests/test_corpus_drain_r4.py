"""Round-4 corpus-drain features, pinned directly (not only through the
yaml replay): string/bool-mixed comparison lowering, nested aggregates
inside sum, anchor-relative *_where conditions, count_where(*).

Reference semantics:
- PredicateIRBuilder::InferAndCastTypes casts the NON-string side of a
  comparison to string and compares lexically whenever either operand is
  a string; a bool against a numeric SafeCasts to 0/1
  (hybridse/src/codegen/predicate_expr_ir_builder.cc:633-700).
- Aggregates nested in another window aggregate's argument evaluate
  over the ANCHOR's frame — frame constants
  (cases/function/function/test_udaf_function.yaml ids 43/47-49/53).
"""

import datetime

import pytest

from openmldb_spark.sqlfe import run_sql


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---- lower_string_cmp -----------------------------------------------

def test_string_vs_timestamp_comparison_lexical_utc8(spark):
    # 1590738989000 ms = 2020-05-29 07:56:29 UTC = 15:56:29 at UTC+8;
    # the reference renders the ts side and compares lexically
    t0 = _df(spark, [(1, "2020-05-29 15:56:29",
                      datetime.datetime(2020, 5, 29, 7, 56, 29))],
             "id bigint, c1 string, c7 timestamp")
    out = run_sql(spark, "select c1 = c7 as eq, c1 <= c7 as le, "
                         "c1 < c7 as lt from {0};", [t0]).collect()[0]
    assert (out.eq, out.le, out.lt) == (True, True, False)


def test_string_vs_numeric_comparison_lexical(spark):
    # lexical, not numeric: '9' > '10' as strings
    t0 = _df(spark, [("9", 10)], "c1 string, c3 int")
    out = run_sql(spark, "select c1 > c3 as gt from {0};", [t0]).collect()
    assert out[0].gt is True


def test_bool_vs_string_comparison_renders_true_false(spark):
    t0 = _df(spark, [(True, "1")], "c9 boolean, c1 string")
    out = run_sql(spark, "select c9 > c1 as gt, c9 = c1 as eq from {0};",
                  [t0]).collect()[0]
    # 'true' > '1' lexically; 'true' != '1'
    assert (out.gt, out.eq) == (True, False)


def test_bool_vs_numeric_comparison_is_01(spark):
    t0 = _df(spark, [(True, 1, 20)], "c9 boolean, c2 int, c3 int")
    out = run_sql(spark, "select c9 = c2 as eq, c9 < c3 as lt from {0};",
                  [t0]).collect()[0]
    assert (out.eq, out.lt) == (True, True)


def test_string_vs_double_drops_trailing_zero(spark):
    # 30.0 renders as '30' (the C formatter drops .0)
    t0 = _df(spark, [("30", 30.0)], "c1 string, c6 double")
    out = run_sql(spark, "select c1 = c6 as eq from {0};", [t0]).collect()
    assert out[0].eq is True


def test_string_string_comparison_untouched(spark):
    t0 = _df(spark, [("a", "b")], "c1 string, c2 string")
    out = run_sql(spark, "select c1 < c2 as lt from {0};", [t0]).collect()
    assert out[0].lt is True


def test_numeric_numeric_comparison_untouched(spark):
    t0 = _df(spark, [(9, 10.5)], "c3 int, c6 double")
    out = run_sql(spark, "select c3 < c6 as lt from {0};", [t0]).collect()
    assert out[0].lt is True


def test_string_literal_in_projection_not_rewritten(spark):
    # a literal containing comparison-looking text must survive verbatim
    t0 = _df(spark, [(1,)], "id bigint")
    out = run_sql(spark, "select 'a > b' as s from {0};", [t0]).collect()
    assert out[0].s == "a > b"


# ---- nested aggregates in sum ---------------------------------------

def test_sum_nested_count(spark):
    # sum(c1 - count(c1)) over frame == sum(c1) - count(c1)^2
    rows = [(1, 10.0, 5), (2, 9.0, 5), (3, 8.0, 5)]
    t0 = _df(spark, rows, "id bigint, c1 double, c3 int")
    out = run_sql(spark, """
        SELECT {0}.id, sum(c1 - count(c1)) OVER w1 AS r1 FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.c3 ORDER BY {0}.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.r1 for r in out.collect()}
    assert got == {1: 9.0, 2: 15.0, 3: 18.0}


def test_sum_nested_product_recursive(spark):
    # sum(c1 + sum(c2 * count(c3))) == sum(c1) + count(c1)*sum(c2)*count(c3)
    rows = [(1, 10.0, 1.0, 5), (2, 9.0, 2.0, 5), (3, 8.0, 3.0, 5)]
    t0 = _df(spark, rows, "id bigint, c1 double, c2 float, c3 int")
    out = run_sql(spark, """
        SELECT {0}.id, sum(c1 + sum(c2 * count(c3))) OVER w1 AS r3 FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.c3 ORDER BY {0}.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.r3 for r in out.collect()}
    assert got == {1: 11.0, 2: 31.0, 3: 81.0}


def test_sum_nested_inside_scalar_over(spark):
    # abs(sum(log(c1) - log(count(c1)))) OVER w — the OVER binds through
    # the scalar wrapper; nested count already a placeholder when the
    # sum is seen
    import math
    rows = [(1, 10.0, 5), (2, 9.0, 5)]
    t0 = _df(spark, rows, "id bigint, c1 double, c3 int")
    out = run_sql(spark, """
        SELECT {0}.id, abs(sum(log(c1) - log(count(c1)))) OVER w1 AS r2
        FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.c3 ORDER BY {0}.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.r2 for r in out.collect()}
    assert got[1] == pytest.approx(math.log(10.0))
    assert got[2] == pytest.approx(
        abs(math.log(10.0) + math.log(9.0) - 2 * math.log(2.0)))


# ---- anchor-relative *_where conditions ------------------------------

_PK_ROWS = [(1, 0, "a"), (2, 0, "b"), (3, 0, "c"), (4, 0, None),
            (5, 0, "b"), (6, 0, None), (7, 0, "c"), (8, 0, "a"),
            (9, 0, None), (10, 0, "c"), (11, 0, "a"), (12, 0, "b")]


def test_count_where_equals_first_value(spark):
    t0 = _df(spark, _PK_ROWS, "id bigint, pk bigint, c1 string")
    out = run_sql(spark, """
        SELECT {0}.id, count_where(id, ifnull(c1, "a") =
            ifnull(first_value(c1), "a")) OVER w1 AS cw FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.pk ORDER BY {0}.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.cw for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 2, 8: 4,
                   9: 5, 10: 3, 11: 6, 12: 3}


def test_count_where_equals_lag0_case_when(spark):
    t0 = _df(spark, _PK_ROWS, "id bigint, pk bigint, c1 string")
    out = run_sql(spark, """
        SELECT {0}.id, case when !isnull(lag(c1,0)) OVER w1 then
            count_where(id, c1 = lag(c1, 0)) OVER w1 else null end AS cw
        FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.pk ORDER BY {0}.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.cw for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: None, 5: 2, 6: None, 7: 2,
                   8: 2, 9: None, 10: 3, 11: 3, 12: 3}


def test_count_where_star(spark):
    t0 = _df(spark, [(1, "aa", 1), (2, "aa", 3), (3, "aa", 5)],
             "id bigint, c1 string, c3 int")
    out = run_sql(spark, """
        SELECT {0}.id, count_where(*, c3 < 4) OVER w1 AS m10 FROM {0}
        WINDOW w1 AS (PARTITION BY {0}.c1 ORDER BY {0}.id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW);""",
                  [t0])
    got = {r.id: r.m10 for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2}
