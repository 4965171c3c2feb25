"""Replay of the reference SDK's notebook-magic test
(python/test/sql_magic_test.py) over our sql_magic + dbapi, plus the
table-rendering contract."""

import pytest

from openmldb_spark import sql_magic
from openmldb_spark.dbapi import connect


@pytest.fixture(scope="module")
def ip_db(spark):
    db = connect("db_magic", spark=spark)
    ip = sql_magic.register(db, test=True)
    return ip, db


def _try(ip, magic_name, sql):
    try:
        ip.run_line_magic(magic_name, sql)
        return True
    except Exception:
        return None


def test_magic_end_to_end(ip_db, capsys):
    ip, db = ip_db
    # cell magic: newlines flattened
    ip.run_cell_magic("sql", "",
                      "create table magic_table\n(x string, y int);")
    assert "magic_table" in db.cursor().get_all_tables()
    assert "Success to execute sql" in capsys.readouterr().out

    with pytest.raises(Exception):
        assert _try(ip, "sql", "create table magic_table;")

    ip.run_line_magic("sql",
                      "insert into magic_table values('first', 100);")
    with pytest.raises(Exception):
        assert _try(ip, "sql",
                    "insert into magic_table values(200, 'second');")
    with pytest.raises(Exception):
        assert _try(ip, "sql",
                    "insert into magic_table values({x: 'first', y:100});")

    capsys.readouterr()
    ip.run_line_magic("sql", "select * from magic_table;")
    out = capsys.readouterr().out
    # PrettyTable-style frame with centered header names and the row
    assert " x " in out and " y " in out
    assert "first" in out and "100" in out
    assert out.count("+---") >= 3 or out.count("+") >= 8

    ip.run_line_magic("sql", "drop table magic_table;")
    assert "magic_table" not in db.cursor().get_all_tables()


def test_print_table_format(capsys):
    sql_magic.print_table(["a", "bb"], [(1, "xy"), (None, "z")])
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "+---+----+"
    assert out[1] == "| a | bb |"
    assert out[3] == "| 1 | xy |"
    assert out[4] == "|   | z  |"
    assert out[5] == "+---+----+"
