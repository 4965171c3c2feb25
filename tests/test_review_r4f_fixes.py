"""Regression pins for the sixth round-4 review pass (SQL front end)."""

import pytest

from openmldb_spark.sqlfe import SqlUnsupported, run_sql


def _t(spark):
    return spark.createDataFrame(
        [(1, "aa", 10, 1_590_000_000_000), (2, "bb", 0, 1_590_000_001_000)],
        "id bigint, c1 string, c2 int, c7 bigint")


def test_literal_containing_table_name_survives(spark):
    t1 = _t(spark)
    out = run_sql(spark, "select 't1.x' as s, c1 from t1",
                  {"t1": t1}).collect()
    assert all(r.s == "t1.x" for r in out)


def test_uppercase_dotted_ref_canonicalizes(spark):
    t1 = _t(spark)
    out = run_sql(spark, "select T1.c1 from t1", {"t1": t1}).collect()
    assert len(out) == 2


def test_question_mark_in_comment_not_a_placeholder(spark):
    t1 = _t(spark)
    out = run_sql(spark,
                  "select c1 from {0} where c2 > ? -- threshold?\n",
                  [t1], params=[5]).collect()
    assert [r.c1 for r in out] == ["aa"]


def test_parenthesized_and_condition_stays_whole(spark):
    left = spark.createDataFrame([(1, 5, 5)], "id bigint, x int, y int")
    right = spark.createDataFrame(
        [(1, 2, 2, 100), (1, 0, 9, 200)],
        "id bigint, x int, y int, ts bigint")
    out = run_sql(spark,
                  "select {0}.id, {1}.ts from {0} last join {1} "
                  "order by {1}.ts on {0}.id = {1}.id and "
                  "({1}.x > 1 and {1}.y > 1)", [left, right]).collect()
    assert out[0].ts == 100


def test_config_clause_with_paren_in_string_value(spark):
    t1 = _t(spark)
    out = run_sql(spark,
                  "select c1 from {0} CONFIG (values = 'a)b')",
                  [t1]).collect()
    assert len(out) == 2


def test_residual_rhs_translates_function_spellings(spark):
    left = spark.createDataFrame([(1, 10, 20)], "id bigint, a int, b int")
    right = spark.createDataFrame(
        [(1, 15, 100), (1, 5, 200)], "id bigint, ts int, v int")
    # `minimum` is the OpenMLDB spelling of least — the simple-compare
    # residual path used to pass it through untranslated
    out = run_sql(spark,
                  "select {0}.id, {1}.v from {0} last join {1} "
                  "order by {1}.ts on {0}.id = {1}.id and "
                  "{1}.ts >= minimum({0}.a, {0}.b)",
                  [left, right]).collect()
    assert out[0].v == 100


def test_window_union_alias_containing_p(spark):
    prim = spark.createDataFrame(
        [("k", 1, 1000, 1.0)], "c1 string, idx int, c7 bigint, v double")
    un = spark.createDataFrame(
        [("k", 0, 500, 2.0)], "c1 string, idx int, c7 bigint, v double")
    out = run_sql(spark, """
        select c1, sum(v) over w1 as s from {0}
        window w1 as (UNION {1} PARTITION BY c1 ORDER BY c7
                      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    """, [prim, un]).collect()
    assert out[0].s == 3.0


def test_count_of_nonconst_expression_starting_with_digit(spark):
    t1 = _t(spark)
    out = run_sql(spark,
                  "select c1, count(2 * c2) as n from {0} group by c1",
                  [t1]).collect()
    assert {r.n for r in out} == {1}
    with pytest.raises(SqlUnsupported):
        run_sql(spark, "select c1, count(1) as n from {0} group by c1",
                [t1])


# ------------------------------------------------- registry / plans

def test_calendar_parts_of_int64_ms(spark):
    """year(1590738989000) over an int64 column: integer operands are
    epoch MILLISECONDS (a seconds-based cast gave year ~52362)."""
    from openmldb_spark.functions.registry import fn
    df = spark.createDataFrame([(1_590_738_989_000,)], "ts_ms long")
    r = df.select(fn("year")(__import__("pyspark.sql.functions",
                                        fromlist=["col"]).col("ts_ms"))
                  .alias("y")).collect()[0]
    assert r.y == 2020


def test_strcmp_null_propagates(spark):
    from openmldb_spark.functions.registry import fn
    import pyspark.sql.functions as F
    df = spark.createDataFrame([("x", None)], "a string, b string")
    r = df.select(fn("strcmp")(F.col("a"), F.col("b")).alias("c"),
                  fn("strcmp")(F.col("a"), F.col("a")).alias("e")
                  ).collect()[0]
    assert r.c is None and r.e == 0


def test_fz_split_single_char_regex_metachar_is_literal(spark):
    from openmldb_spark.functions.registry import fn
    import pyspark.sql.functions as F
    df = spark.createDataFrame([("a|b", "k.v")], "s string, t string")
    r = df.select(fn("fz_split")(F.col("s"), "|").alias("p"),
                  fn("fz_split")(F.col("t"), ".").alias("q")).collect()[0]
    assert r.p == ["a", "b"] and r.q == ["k", "v"]


def test_plan_stats_counts_all_exchange_kinds(spark):
    from openmldb_spark.plans.explain import plan_stats
    df = spark.range(100)
    st = plan_stats(df.repartition(4))       # round-robin
    assert st.exchanges >= 1
    import pyspark.sql.functions as F
    st2 = plan_stats(df.groupBy().agg(F.sum("id")))
    assert st2.exchanges >= 1                # Exchange SinglePartition
    st3 = plan_stats(df)
    assert st3.exchanges == 0


def test_plan_stats_empty_pushed_filters_not_counted(spark, sf_dir):
    from openmldb_spark.plans.explain import plan_stats
    scan = spark.read.parquet(f"{sf_dir}/nation.parquet")
    no_push = plan_stats(scan)
    assert no_push.scans == 1                # not double-counted
    assert no_push.pushed_filters == []
    pushed = plan_stats(scan.where("n_nationkey = 3"))
    assert len(pushed.pushed_filters) >= 1
