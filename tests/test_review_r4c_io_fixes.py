"""Regression pins for the io.py findings of the third round-4 review
pass (soft-copy schema, option parsing, parquet LOAD validation,
single-file CSV edge modes)."""

import pytest


def test_soft_copy_catalog_keeps_schema(spark, tmp_path):
    """Catalog soft copy must record the schema (explicit or inferred
    once) — table() previously rebuilt the reader schema-less and every
    column came back StringType."""
    from openmldb_spark.sources.io import Catalog
    src = str(tmp_path / "src.csv")
    with open(src, "w") as f:
        f.write("a,b\n1,2.5\n3,4.5\n")
    cat = Catalog(spark, str(tmp_path / "offline"))
    cat.load_data("t", src, fmt="csv", deep_copy=False)
    df = cat.table("t")
    kinds = [f.dataType.simpleString() for f in df.schema.fields]
    assert kinds != ["string", "string"], "inferred schema was dropped"
    assert df.where("b > 3").count() == 1


def test_stmt_option_double_quoted_comma(spark):
    """OPTIONS(delimiter=\",\") — a comma inside a double-quoted value
    must not split the option list."""
    from openmldb_spark.sources.io import _parse_stmt_options
    got = _parse_stmt_options('format=\'csv\', delimiter=","')
    assert got["delimiter"] == (",", True)
    assert got["format"] == ("csv", True)


def test_parquet_load_validates_schema(spark, tmp_path):
    """Statement-level parquet LOAD must check the file schema against
    the table and convert epoch-ms bigints into timestamp columns."""
    from openmldb_spark.sources.io import run_statement
    good = str(tmp_path / "good.parquet")
    spark.createDataFrame(
        [("k", 1_590_738_989_000)], "c1 string, c7 long"
    ).write.parquet(good)
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([("k", "x")], "c1 string, cX string") \
        .write.parquet(bad)
    tables = {}
    run_statement(spark, "create table tpq (c1 string, c7 timestamp)",
                  tables)
    run_statement(spark, f"load data infile '{good}' into table tpq "
                         f"options (format='parquet')", tables)
    row = tables["tpq"].collect()[0]
    assert row.c7.year == 2020          # epoch-ms long converted
    with pytest.raises(ValueError, match="do not match table columns"):
        run_statement(spark, f"load data infile '{bad}' into table tpq "
                             f"options (format='parquet')", tables)


def test_soft_copy_statement_registers_lazy_and_rejects_append(
        spark, tmp_path):
    from openmldb_spark.sources.io import run_statement
    src = str(tmp_path / "soft.csv")
    with open(src, "w") as f:
        f.write("c1,c2\nk,1\n")
    tables = {}
    run_statement(spark, "create table ts1 (c1 string, c2 int)", tables)
    run_statement(
        spark, f"load data infile '{src}' into table ts1 "
               f"options (deep_copy=false)", tables)
    assert [tuple(r) for r in tables["ts1"].collect()] == [("k", 1)]
    # later file changes stay visible — the defining soft-copy property
    with open(src, "a") as f:
        f.write("k2,2\n")
    assert tables["ts1"].count() == 2
    with pytest.raises(ValueError, match="append"):
        run_statement(
            spark, f"load data infile '{src}' into table ts1 "
                   f"options (deep_copy=false, mode='append')", tables)


def test_single_csv_ignore_mode_is_noop(spark, tmp_path):
    from openmldb_spark.sources.io import select_into
    out = str(tmp_path / "out.csv")
    df = spark.createDataFrame([(1,)], "a int")
    select_into(df, out, fmt="csv", mode="overwrite")
    before = open(out).read()
    select_into(spark.createDataFrame([(9,)], "a int"), out,
                fmt="csv", mode="ignore")
    assert open(out).read() == before


def test_nul_quoted_backslash_field_roundtrips(spark, tmp_path):
    """A delimiter-containing field with a backslash must survive the
    NUL-unwrap (univocity doubles the escape char inside quotes)."""
    from openmldb_spark.sources.io import select_into
    out = str(tmp_path / "raw.csv")
    df = spark.createDataFrame([("a,b\\c",)], "v string")
    select_into(df, out, fmt="csv", mode="overwrite",
                options={"header": "false", "quote": "\u0000"})
    assert open(out, "rb").read().rstrip(b"\n") == b"a,b\\c"


def test_empty_quote_option_unwraps_like_nul(spark, tmp_path):
    """quote='' maps to NUL inside Spark's CSVOptions — the unwrap
    trigger must treat it the same or exports grow stray NUL bytes."""
    from openmldb_spark.sources.io import select_into
    out = str(tmp_path / "rawempty.csv")
    df = spark.createDataFrame([("a,b",)], "v string")
    select_into(df, out, fmt="csv", mode="overwrite",
                options={"header": "false", "quote": ""})
    data = open(out, "rb").read()
    assert b"\x00" not in data
    assert data.rstrip(b"\n") == b"a,b"
