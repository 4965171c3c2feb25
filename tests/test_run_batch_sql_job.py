"""The batch-SQL script job (jobs/run_batch_sql.py — RunBatchSql /
ImportOfflineData / ExportOfflineData twin) end-to-end via real
spark-submit --py-files, from OUTSIDE the repo so the engine can only
come from the zip archive; plus unit tests for the script splitter."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from openmldb_spark.sources.session import Session, execute_script, \
    split_statements

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_split_statements_edges():
    got = split_statements(
        "use db; -- trailing; comment\n"
        "insert into t values ('a;b\\'c;', 1);\n"
        "create procedure p (x int) begin select * from t; end;\n"
        "select * from t")
    assert got == [
        "use db;",
        "insert into t values ('a;b\\'c;', 1);",
        "create procedure p (x int) begin select * from t; end;",
        "select * from t"]
    assert split_statements("  -- only a comment\n") == []


def test_execute_script_returns_last_result(spark):
    s = Session(spark, db="scr")
    out = execute_script(s, """
        create table t1 (x string, y int);
        insert into t1 values ('a', 1), ('b', 2);
        select * from t1 where y = 2;
    """)
    assert [tuple(r) for r in out.collect()] == [("b", 2)]
    # a script ending on a command returns None
    assert execute_script(s, "create table t2 (z int);") is None


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_run_batch_sql_spark_submit(tmp_path):
    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "openmldb_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    iso = tmp_path / "iso" / "jobs"
    iso.mkdir(parents=True)
    shutil.copy(os.path.join(REPO, "jobs", "run_batch_sql.py"), iso)

    outdir = tmp_path / "export"
    script = tmp_path / "script.sql"
    script.write_text(f"""
-- import: LOAD DATA from the registered-parquet path analog
create table docs_sel (doc_id bigint, lang string);
insert into docs_sel values (1, 'en');
select d.doc_id, d.lang from docs_sel d
  into outfile '{outdir}' options (format='csv', mode='overwrite');
select count(*) as n from documents;
""")
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[8]",
         "--py-files", str(zip_path), "jobs/run_batch_sql.py",
         "--sql-file", str(script), "--db", "main",
         "--table",
         "documents=/root/testdata/sf0.001/documents.parquet"],
        cwd=str(iso.parent), capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["columns"] == ["n"]
    assert rec["rows"] == 1
    # the export statement actually wrote the CSV
    assert outdir.exists()
    # the .show() of the final SELECT reached stdout
    assert "| n " in out.stdout or "|n " in out.stdout or \
        "n  " in out.stdout
