"""CLI shell (mclient analog)."""

import io

from monetdb_tpu.cli import Shell, format_table, main
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_format_table():
    out = format_table(["a", "bb"], [(1, "x"), (None, "yy")])
    lines = out.splitlines()
    assert lines[0] == "+---+----+" or "-" in lines[0]
    assert "NULL" in out and "2 tuples" in out


def test_shell_statements_and_backslash():
    s = Session(Database())
    sh = Shell(s.sql)
    out = io.StringIO()
    sh.run_statement("create table t (a int)", out)
    sh.run_statement("insert into t values (1), (2)", out)
    sh.run_statement("select a from t order by a", out)
    text = out.getvalue()
    assert "operation successful" in text
    assert "2 affected rows" in text
    assert "2 tuples" in text
    out = io.StringIO()
    assert sh.run_backslash("\\d", out)
    assert "t" in out.getvalue()
    out = io.StringIO()
    assert sh.run_backslash("\\d t", out)
    assert "a" in out.getvalue()
    assert not sh.run_backslash("\\q", io.StringIO())


def test_shell_repl_stream():
    s = Session(Database())
    sh = Shell(s.sql)
    out = io.StringIO()
    src = io.StringIO("create table t (a int);\n"
                      "insert into t values (42);\n"
                      "select a from t;\n")
    sh.repl(src, out)
    assert "42" in out.getvalue()


def test_main_oneshot(tmp_path, capsys):
    rc = main([str(tmp_path / "db"), "-s", "create table t (a int)",
               "-s", "insert into t values (5)", "-s", "select a from t"])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "5" in cap and "1 tuple" in cap
