"""Round-4 advisor regression tests.

Each test pins one of the ADVICE.md round-3 findings:
1. resolve_databases must not rewrite ``db.table`` text inside string
   literals (string-masked like the rest of the front end).
2. _boolify_sql's projection span ends at the first FROM at paren
   depth 0 - a FROM belonging to a scalar sub-query in the select list
   must not bind; and run_sql's coercion-retry survives an intermediate
   rewrite that itself fails to parse.
3. _write_single_csv with quote=NUL unwraps only univocity's NUL quote
   wrappers - legitimate NUL bytes inside field data survive.
4. The WINDOW UNION schema check accepts only int64<->timestamp, not
   arbitrary integer widths (test_window_union.yaml id 2 class).
5. _fz_split returns a typed empty array<string> in its empty branches
   (array<void> would mistype fz_join and friends).
"""

import pytest

from openmldb_spark.sqlfe import (SqlUnsupported, _boolify_sql,
                                  resolve_databases, run_sql)

NUL = b"\x00"


# -- 1. resolve_databases is string-masked ----------------------------------

def test_resolve_databases_leaves_string_literals_alone():
    tables = {"db1.t0": "DF0"}
    sql = "select c1, 'db1.t0' as tag from db1.t0"
    out, flat = resolve_databases(sql, tables, default_db=None)
    assert "'db1.t0'" in out            # the literal survives verbatim
    assert "from __db_db1__t0" in out   # the table ref is rewritten
    assert flat == {"__db_db1__t0": "DF0"}


def test_resolve_databases_default_db_literal_untouched():
    tables = {"db1.t0": "DF0"}
    sql = "select 'db1.anything' as s from t0"
    out, _ = resolve_databases(sql, tables, default_db="db1")
    assert "'db1.anything'" in out
    assert "from __db_db1__t0" in out


def test_resolve_databases_bare_name_in_literal_not_resolved():
    # a bare table name that appears ONLY inside a string literal must
    # not trigger default-db resolution (or its failure path)
    tables = {"db1.t0": "DF0", "db1.u": "DF1"}
    sql = "select c1, 'from u' as s from db1.t0"
    out, _ = resolve_databases(sql, tables, default_db=None)
    assert "'from u'" in out


# -- 2. _boolify_sql depth-0 FROM -------------------------------------------

def test_boolify_sql_scalar_subquery_in_projection():
    sql = ("select (select max(c1) from u) as m, !c2 from t "
           "where c2")
    out = _boolify_sql(sql)
    # the sub-select survives intact - the rewrite did not split at the
    # sub-query's FROM
    assert "select max(c1) from u" in out.lower()
    # the outer FROM is still present at depth 0
    assert " from t" in out.lower()


def test_boolify_sql_plain_projection_unchanged_shape():
    out = _boolify_sql("select !c2 as x from t where c2 and c3")
    assert " from t" in out.lower()
    assert "as x" in out.lower()


def test_run_sql_retry_survives_broken_intermediate(spark):
    # a query that needs the ms-tables retry (timestamp + int) must not
    # abort if the boolify rewrite of an exotic projection fails
    import datetime
    df = spark.createDataFrame(
        [(datetime.datetime(2020, 1, 1), 1)], ["ts", "c1"])
    out = run_sql(spark, "select ts + 1000 as t2 from {0}", [df])
    assert out.collect()[0].t2 == 1577836801000


# -- 3. NUL-quote unwrapping ------------------------------------------------

def test_unwrap_nul_quotes_preserves_data_nuls():
    from openmldb_spark.sources.io import _unwrap_nul_quotes
    # field 2 of line 1 is NUL-quoted (contains the delimiter); field 1
    # of line 2 contains a LEGITIMATE NUL byte in data position
    data = b"a," + NUL + b"x,y" + NUL + b",b\nc" + NUL + b"d,e,f\n"
    got = _unwrap_nul_quotes(data, b",")
    assert got == b"a,x,y,b\nc" + NUL + b"d,e,f\n"


def test_unwrap_nul_quotes_escaped_quote_inside_field():
    from openmldb_spark.sources.io import _unwrap_nul_quotes
    # backslash-escaped NUL inside a quoted field decodes to one NUL
    data = NUL + b"a\\" + NUL + b"b" + NUL + b",z\n"
    assert _unwrap_nul_quotes(data, b",") == b"a" + NUL + b"b,z\n"
    # doubled NUL inside a quoted field decodes to one NUL
    data = NUL + b"a" + NUL + NUL + b"b" + NUL + b",z\n"
    assert _unwrap_nul_quotes(data, b",") == b"a" + NUL + b"b,z\n"


def test_unwrap_nul_quotes_quote_opens_only_at_field_start():
    from openmldb_spark.sources.io import _unwrap_nul_quotes
    data = b"ab" + NUL + b"cd,e\n"   # mid-field NUL is data, not a quote
    assert _unwrap_nul_quotes(data, b",") == b"ab" + NUL + b"cd,e\n"


def test_select_into_nul_quote_roundtrip(spark, tmp_path):
    from openmldb_spark.sources.io import select_into
    df = spark.createDataFrame([("a,b", 1), ("plain", 2)], ["s", "n"])
    out = str(tmp_path / "out.csv")
    select_into(df, out, "csv",
                {"quote": chr(0), "header": "false"}, mode="overwrite")
    lines = sorted(open(out, "rb").read().splitlines())
    # the delimiter-containing value is written RAW (quote wrappers
    # stripped), shifting columns on reload - the reference contract
    assert lines == [b"a,b,1", b"plain,2"]


# -- 4. WINDOW UNION type leniency is exactly int64<->timestamp -------------

_UNION_SQL = """
SELECT conv_id, turn_idx, sum(value) OVER w1 AS s
FROM transcripts WINDOW w1 AS (
  UNION history
  PARTITION BY transcripts.conv_id ORDER BY transcripts.ts_ms
  ROWS_RANGE BETWEEN 10s PRECEDING AND CURRENT ROW)
"""


def _union_tables(spark, hist_schema, hist_ts=500):
    import datetime
    t = spark.createDataFrame(
        [("a", 0, 1000, 1.0)],
        "conv_id string, turn_idx int, ts_ms bigint, value double")
    if "timestamp" in hist_schema:
        hist_ts = datetime.datetime.fromtimestamp(
            hist_ts / 1000.0, datetime.timezone.utc)
    hist = spark.createDataFrame([("a", -1, hist_ts, 10.0)], hist_schema)
    return {"transcripts": t, "history": hist}


def test_window_union_rejects_int_width_mismatch(spark):
    # turn_idx int (primary) vs bigint (union) -> reject, like the
    # reference's exact schema check
    tables = _union_tables(
        spark, "conv_id string, turn_idx bigint, ts_ms bigint, "
               "value double")
    with pytest.raises(SqlUnsupported, match="UNION column"):
        run_sql(spark, _UNION_SQL, tables)


def test_window_union_accepts_long_timestamp_interchange(spark):
    tables = _union_tables(
        spark, "conv_id string, turn_idx int, ts_ms timestamp, "
               "value double")
    # int64 <-> timestamp stays interchangeable (OpenMLDB ts IS i64 ms)
    out = run_sql(spark, _UNION_SQL, tables)
    assert out.collect()[0].s == 11.0


# -- 5. _fz_split empty branches are typed ----------------------------------

def test_fz_split_empty_delim_is_string_array(spark):
    from openmldb_spark.functions.registry import _fz_split, fz_join
    import pyspark.sql.functions as F
    df = spark.createDataFrame([("a:b",)], ["s"])
    out = df.select(
        _fz_split("s", "").alias("arr"),
        fz_join(_fz_split("s", ""), "-").alias("j"),
        fz_join(F.when(F.col("s").isNull(), _fz_split("s", ""))
                 .otherwise(F.array(F.lit("x"))), "-").alias("mix"))
    assert dict(out.dtypes)["arr"] == "array<string>"
    row = out.collect()[0]
    assert row.arr == [] and row.j == "" and row.mix == "x"


def test_fz_split_by_key_value_empty_kv_delim_typed(spark):
    from openmldb_spark.functions.registry import (fz_split_by_key,
                                                   fz_split_by_value)
    df = spark.createDataFrame([("k:v,x",)], ["s"])
    out = df.select(fz_split_by_key("s", ",", "").alias("k"),
                    fz_split_by_value("s", ",", "").alias("v"))
    assert dict(out.dtypes) == {"k": "array<string>",
                                "v": "array<string>"}
    row = out.collect()[0]
    assert row.k == [] and row.v == []
