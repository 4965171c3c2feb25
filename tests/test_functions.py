"""Golden tests for the scalar function registry (SURVEY.md §2.8)."""

import math

import pytest
import pyspark.sql.functions as F

from openmldb_spark.functions.registry import REGISTRY, fn


def test_registry_coverage():
    # the OpenMLDB surface we map (112 builtins → these plus direct
    # Window/UDAF handling in the kernel)
    assert len(REGISTRY) >= 80
    for name in ["concat", "substr", "upper", "strcmp", "truncate", "cot",
                 "ifnull", "nvl2", "fz_split", "fz_split_by_key",
                 "fz_split_by_value", "fz_join", "minimum", "maximum",
                 "int64", "date_format", "dayofweek"]:
        assert name in REGISTRY, name


def test_scalar_goldens(spark):
    df = spark.range(1)
    row = df.select(
        fn("strcmp")(F.lit("a"), F.lit("b")).alias("cmp_lt"),
        fn("strcmp")(F.lit("b"), F.lit("a")).alias("cmp_gt"),
        fn("strcmp")(F.lit("a"), F.lit("a")).alias("cmp_eq"),
        fn("truncate")(F.lit(-2.7)).alias("trunc_neg"),
        fn("truncate")(F.lit(2.7)).alias("trunc_pos"),
        fn("cot")(F.lit(1.0)).alias("cot1"),
        fn("nvl2")(F.lit(None), F.lit("a"), F.lit("b")).alias("nvl2_null"),
        fn("nvl2")(F.lit(1), F.lit("a"), F.lit("b")).alias("nvl2_nn"),
        fn("minimum")(F.lit(3), F.lit(5)).alias("mn"),
        fn("maximum")(F.lit(3), F.lit(5)).alias("mx"),
        fn("inc")(F.lit(41)).alias("inc41"),
        fn("replace")(F.lit("aaa"), "a", "b").alias("repl"),
        fn("char_length")(F.lit("héllo")).alias("clen"),
        fn("int32")(F.lit("42")).alias("i32"),
        fn("bool")(F.lit(1)).alias("b1"),
    ).first()
    assert (row.cmp_lt, row.cmp_gt, row.cmp_eq) == (-1, 1, 0)
    assert row.trunc_neg == -2.0 and row.trunc_pos == 2.0
    assert math.isclose(row.cot1, 1 / math.tan(1.0))
    assert (row.nvl2_null, row.nvl2_nn) == ("b", "a")
    assert (row.mn, row.mx) == (3, 5)
    assert row.inc41 == 42
    assert row.repl == "bbb"
    assert row.clen == 5
    assert row.i32 == 42 and row.b1 is True


def test_fz_split_family(spark):
    df = spark.range(1).select(F.lit("a:1,b:2,c:3").alias("s"))
    row = df.select(
        fn("fz_split")(F.col("s"), ",").alias("parts"),
        fn("fz_split_by_key")(F.col("s"), ",", ":").alias("keys"),
        fn("fz_split_by_value")(F.col("s"), ",", ":").alias("vals"),
        fn("fz_join")(fn("fz_split")(F.col("s"), ","), "|").alias("joined"),
    ).first()
    assert row.parts == ["a:1", "b:2", "c:3"]
    assert row.keys == ["a", "b", "c"]
    assert row.vals == ["1", "2", "3"]
    assert row.joined == "a:1|b:2|c:3"


def test_unknown_function_raises():
    with pytest.raises(KeyError):
        fn("definitely_not_a_function")


def test_date_format_strftime_and_tz(spark):
    """date_format takes strftime patterns and renders at fixed UTC+8
    (udf.cc:54,193-216): 2024-01-01T20:00Z = 2024-01-02 04:00 in +8."""
    df = spark.range(1).select(
        F.timestamp_millis(F.lit(1704139200000)).alias("ts"))
    row = df.select(
        fn("date_format")(F.col("ts"), "%Y-%m-%d %H:%M:%S").alias("full"),
        fn("date_format")(F.col("ts"), "%d/%m/%y").alias("dmy"),
        fn("hour")(F.col("ts")).alias("h"),
        fn("day")(F.col("ts")).alias("d"),
    ).first()
    assert row.full == "2024-01-02 04:00:00"
    assert row.dmy == "02/01/24"
    assert row.h == 4 and row.d == 2


def test_like_match_escape(spark):
    df = spark.range(1).select(F.lit("M_ke").alias("s"))
    row = df.select(
        fn("like_match")(F.col("s"), "M#_ke", "#").alias("esc_hit"),
        fn("like_match")(F.col("s"), "M#_ke", "").alias("no_esc"),
        fn("like_match")(F.lit("Mike"), "M#_ke", "#").alias("esc_miss"),
        fn("ilike_match")(F.col("s"), "m#_KE", "#").alias("iesc"),
    ).first()
    # with '#' escape, '#_' is a literal underscore
    assert row.esc_hit is True and row.esc_miss is False
    # empty escape disables escaping: '#' is literal, '_' is a wildcard
    assert row.no_esc is False
    assert row.iesc is True


def test_make_tuple(spark):
    row = spark.range(1).select(
        fn("make_tuple")(F.lit(1), F.lit("a")).alias("t")).first()
    assert tuple(row.t) == (1, "a")
