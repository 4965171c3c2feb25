"""The interactive console (openmldb_spark/cli.py) against the
reference shell's contract (src/cmd/sql_cmd.h::Shell)."""

import io

import pytest

from openmldb_spark.cli import handle_sql, render_result, repl
from openmldb_spark.sources.session import Session


@pytest.fixture()
def sess(spark):
    s = Session(spark, db="clidb")
    return s


def _run(sess, script: str) -> str:
    out = io.StringIO()
    repl(sess, stdin=io.StringIO(script), stdout=out)
    return out.getvalue()


def test_succeed_error_and_table(sess):
    out = _run(sess, "\n".join([
        "create table t1 (c1 string, c2 int);",
        "insert into t1 values ('aaa', 11), ('bb', 12);",
        "select * from t1;",
        "select broken syntax;;;",
        "quit",
    ]))
    assert out.count("SUCCEED") == 2
    # TextTable frame: ruler, header, ruler, rows, ruler + count
    assert " ----- ---- " in out
    assert "  c1    c2  " in out
    assert "  aaa   11  " in out
    assert "2 rows in set" in out
    assert "Error: " in out
    assert out.rstrip().endswith("Bye")


def test_multiline_statement_and_prompts(sess):
    out = _run(sess, "create table t2\n(x int);\nexit;\n")
    # first prompt, then the aligned continuation prompt
    assert "spark/clidb> " in out
    assert "-> " in out
    assert "SUCCEED" in out
    assert "Bye" in out


def test_eof_exits_cleanly(sess):
    assert _run(sess, "") == "spark/clidb> "


def test_one_cmd_mode(sess, capsys):
    out = io.StringIO()
    sess.execute("create table t3 (a int)")
    repl(sess, stdout=out, one_cmd="select * from t3")
    text = out.getvalue()
    assert "0 rows in set" in text


def test_null_and_type_rendering(sess):
    sess.execute("create table t4 (a string, b bool, c timestamp)")
    sess.execute("insert into t4 values (null, true, 1620471840256)")
    df = sess.execute("select * from t4")
    text = render_result(df)
    assert "NULL" in text and "true" in text and "1620471840256" in text


def test_use_switches_prompt_db(sess):
    out = _run(sess, "create database db2;\nuse db2;\nquit;\n")
    assert "spark/db2> " in out


def test_pasted_multi_statement_line_runs_each(sess):
    out = _run(sess, "\n".join([
        "create table t9 (a int); insert into t9 values (3);",
        "select * from t9;",
        "quit",
    ]))
    assert out.count("SUCCEED") == 2
    assert "1 rows in set" in out
