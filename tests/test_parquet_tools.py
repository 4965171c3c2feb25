"""jobs/parquet_tools.py — the batchjob tool mains (Inspect / Sample /
Compare / CreateTableFromParquet / ShowBatchVersion twins)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from parquet_tools import (compare_parquet, create_table_from_parquet,  # noqa: E402
                           create_table_sql, engine_version,
                           inspect_parquet, sample_parquet)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_inspect(spark, capsys):
    out = inspect_parquet(spark, DOCS)
    assert out["rows"] > 0
    text = capsys.readouterr().out
    assert "Schema: " in text and "Count of rows: " in text


def test_sample(spark, tmp_path):
    dest = str(tmp_path / "sampled")
    kept = sample_parquet(spark, DOCS, dest, 10)
    got = spark.read.parquet(dest)
    # Bernoulli can undershoot the cap; the return value must be the
    # count actually written, never the requested cap
    assert kept == got.count() <= 10
    assert got.schema == spark.read.parquet(DOCS).schema


def test_compare(spark, tmp_path, capsys):
    assert compare_parquet(spark, DOCS, DOCS) is True
    assert "are equal" in capsys.readouterr().out
    dest = str(tmp_path / "subset")
    sample_parquet(spark, DOCS, dest, 5)
    assert compare_parquet(spark, DOCS, dest) is False
    assert "not equal" in capsys.readouterr().out


def test_compare_sees_duplicate_multiplicity(spark, tmp_path, capsys):
    # same DISTINCT rows but different counts must compare unequal —
    # the subtracts alone cannot tell [a,a,b] from [a,b]
    base = spark.read.parquet(DOCS).limit(3)
    p1, p2 = str(tmp_path / "dup"), str(tmp_path / "nodup")
    base.union(base).write.parquet(p1)
    base.write.parquet(p2)
    assert compare_parquet(spark, p1, p2) is False
    assert "not equal" in capsys.readouterr().out


def test_create_table_from_parquet(spark, tmp_path):
    small = str(tmp_path / "small")
    sample_parquet(spark, DOCS, small, 7)
    stmts = create_table_sql(spark, "tooldb", "t_docs", small)
    assert stmts[0] == "CREATE DATABASE tooldb"
    assert stmts[2].startswith("CREATE TABLE t_docs (")
    assert "LOAD DATA INFILE" in stmts[3]
    sess = create_table_from_parquet(spark, "tooldb", "t_docs", small)
    n = sess.execute("select count(*) as n from t_docs").collect()[0].n
    assert n == spark.read.parquet(small).count()


def test_version():
    assert "pyspark" in engine_version()
