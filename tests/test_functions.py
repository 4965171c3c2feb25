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
