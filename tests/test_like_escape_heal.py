"""Round-4 heal: LIKE escape before an ordinary char.

The reference's like_internal treats ``esc`` + ANY char as an exact
match of that char (hybridse/src/udf/udf.cc:336-348); Spark raises
INVALID_FORMAT.ESC_IN_THE_MIDDLE. Literal patterns are now rewritten at
translation time (sqlfe._norm_pat_sql / registry.normalize_like_pattern)
so the operator form, like_match()/ilike_match(), and the DataFrame-API
registry function all match the reference. A lone trailing escape under
the default backslash escape is also lowered to the reference's
constant-false (udf.cc:339-342) instead of Spark's ESC_AT_THE_END error.
"""

import pytest

from openmldb_spark.functions.registry import (lone_trailing_escape,
                                               normalize_like_pattern)
from openmldb_spark.sqlfe import run_sql


def test_normalize_like_pattern_unit():
    # escape before ordinary char drops the escape
    assert normalize_like_pattern("a#bc", "#") == "abc"
    assert normalize_like_pattern("a\\bc", "\\") == "abc"
    # escape before %, _ or the escape itself is preserved
    assert normalize_like_pattern("#_a#%b##c", "#") == "#_a#%b##c"
    assert normalize_like_pattern("\\_a%b", "\\") == "\\_a%b"
    # mixed: only the ordinary-char escapes are dropped
    assert normalize_like_pattern("#_x#yz#%", "#") == "#_xyz#%"
    # trailing lone escape is left for the caller's constant-false path
    assert normalize_like_pattern("abc#", "#") == "abc#"
    assert lone_trailing_escape("abc#", "#")
    assert not lone_trailing_escape("abc##", "#")


@pytest.fixture(scope="module")
def t(spark):
    return spark.createDataFrame(
        [(1, "abc"), (2, "axc"), (3, None)], ["id", "c1"])


def _vals(df):
    return [r.v for r in df.orderBy("id").collect()]


def test_operator_like_default_escape_ordinary_char(spark, t):
    df = run_sql(spark, r"select id, c1 like 'a\\bc' as v from t", {"t": t})
    assert _vals(df) == [True, False, None]


def test_operator_like_explicit_escape_ordinary_char(spark, t):
    df = run_sql(
        spark, "select id, c1 like 'a#bc' escape '#' as v from t", {"t": t})
    assert _vals(df) == [True, False, None]


def test_operator_not_like_escaped_ordinary_char(spark, t):
    df = run_sql(
        spark, "select id, c1 not like 'a#bc' escape '#' as v from t",
        {"t": t})
    assert _vals(df) == [False, True, None]


def test_like_match_fn_escape_ordinary_char(spark, t):
    df = run_sql(
        spark, "select id, like_match(c1, 'a#bc', '#') as v from t",
        {"t": t})
    assert _vals(df) == [True, False, None]


def test_ilike_match_fn_escape_ordinary_char(spark, t):
    df = run_sql(
        spark, "select id, ilike_match(c1, 'A#BC', '#') as v from t",
        {"t": t})
    assert _vals(df) == [True, False, None]


def test_operator_like_default_escape_lone_trailing(spark, t):
    # udf.cc:339-342 — pattern terminated by the escape char: false for
    # every non-null target, NULL propagated
    df = run_sql(spark, r"select id, c1 like 'abc\\' as v from t", {"t": t})
    assert _vals(df) == [False, False, None]


def test_registry_like_match_column_api(spark, t):
    from openmldb_spark.functions.registry import REGISTRY
    got = [r.v for r in t.select(
        "id", REGISTRY["like_match"](t.c1, "a#bc", "#").alias("v"))
        .orderBy("id").collect()]
    assert got == [True, False, None]


def test_registry_like_match_default_escape(spark, t):
    from openmldb_spark.functions.registry import REGISTRY
    got = [r.v for r in t.select(
        "id", REGISTRY["like_match"](t.c1, "a\\bc").alias("v"))
        .orderBy("id").collect()]
    assert got == [True, False, None]
