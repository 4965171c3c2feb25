#!/usr/bin/env python
"""Parquet utility job — Python twin of the reference task manager's
tool mains (java/openmldb-batchjob/.../tools/): InspectParquet,
SampleParquet, CompareParquetResult, CreateTableFromParquet, plus
ShowBatchVersion (batchjob/ShowBatchVersion.scala).

    spark-submit --py-files engine.zip jobs/parquet_tools.py inspect <path>
    ... sample <in> <out> <keep_rows>
    ... compare <path1> <path2>
    ... create-table <db> <table> <parquet>   (prints the generated SQL)
    ... version
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmldb_spark.session import get_spark  # noqa: E402

# reference type spelling for generated DDL
# (DataTypeUtil.sparkTypeToString)
_DDL_TYPES = {"smallint": "smallint", "int": "int", "bigint": "bigint",
              "float": "float", "double": "double", "boolean": "bool",
              "string": "string", "date": "date",
              "timestamp": "timestamp"}


def inspect_parquet(spark, path: str) -> dict:
    df = spark.read.parquet(path)
    out = {"schema": df.schema.simpleString(), "rows": df.count()}
    print("Schema: " + out["schema"])
    print("Count of rows: " + str(out["rows"]))
    print("Show data:")
    df.show()
    return out


def sample_parquet(spark, path: str, out_path: str, keep_rows: int) -> int:
    """Bernoulli sample then LIMIT to the cap — the reference's
    1.01x-oversample recipe. Returns the number of rows actually
    written (Bernoulli can undershoot the cap)."""
    df = spark.read.parquet(path)
    n = df.count()
    if n:
        df = df.sample(min(1.0, 1.01 * min(keep_rows, n) / n)) \
               .limit(keep_rows)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path).count()


def compare_parquet(spark, p1: str, p2: str) -> bool:
    """Row-count + distinct-row comparison (the subtracts alone cannot
    see duplicate multiplicity — a count mismatch is inequality even
    when the distinct sets agree)."""
    df1 = spark.read.parquet(p1).cache()
    df2 = spark.read.parquet(p2).cache()
    c1, c2 = df1.count(), df2.count()
    if c1 != c2:
        print("Two dataframes are not equal")
        print(f"Df1 count: {c1}, Df2 count: {c2}")
        return False
    e1 = df1.subtract(df2).isEmpty()     # Spark EXCEPT = distinct
    e2 = df2.subtract(df1).isEmpty()
    equal = e1 and e2
    if equal:
        print("Two dataframes are equal")
    else:
        print("Two dataframes are not equal")
        print(f"df1 - df2 is empty: {e1}, df2 - df1 is empty: {e2}")
    return equal


def create_table_sql(spark, db: str, table: str, path: str) -> list[str]:
    """The CREATE DATABASE / USE / CREATE TABLE / LOAD DATA script the
    reference tool generates from the parquet schema
    (CreateTableFromParquet.scala:30-58)."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"{f.name} {_DDL_TYPES.get(f.dataType.simpleString(), 'string')}"
        for f in schema.fields)
    return [f"CREATE DATABASE {db}",
            f"USE {db}",
            f"CREATE TABLE {table} ({cols})",
            f"LOAD DATA INFILE '{path}' INTO TABLE {table} "
            f"OPTIONS (format='parquet')"]


def create_table_from_parquet(spark, db: str, table: str, path: str):
    from openmldb_spark.sources.session import Session
    sess = Session(spark)
    for stmt in create_table_sql(spark, db, table, path):
        print(stmt)
        sess.execute(stmt)
    return sess


def engine_version() -> str:
    import pyspark
    return f"openmldb-spark 0.4 (pyspark {pyspark.__version__})"


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("inspect"); p.add_argument("path")
    p = sub.add_parser("sample")
    p.add_argument("path"); p.add_argument("out"); p.add_argument(
        "keep_rows", type=int)
    p = sub.add_parser("compare"); p.add_argument("p1"); p.add_argument("p2")
    p = sub.add_parser("create-table")
    p.add_argument("db"); p.add_argument("table"); p.add_argument("path")
    sub.add_parser("version")
    args = ap.parse_args()

    if args.cmd == "version":
        print("OpenMLDB Batch version: " + engine_version())
        return
    spark = get_spark(app_name="openmldb-parquet-tools")
    if args.cmd == "inspect":
        inspect_parquet(spark, args.path)
    elif args.cmd == "sample":
        sample_parquet(spark, args.path, args.out, args.keep_rows)
    elif args.cmd == "compare":
        compare_parquet(spark, args.p1, args.p2)
    elif args.cmd == "create-table":
        create_table_from_parquet(spark, args.db, args.table, args.path)


if __name__ == "__main__":
    main()
