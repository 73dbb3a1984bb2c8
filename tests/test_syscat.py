"""System catalog relations (sys.tables/columns/storage/env/queue) —
reference: sql/scripts/{77_storage,26_sysmon,91_information_schema}.sql."""

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b varchar(10))")
    s.sql("insert into t values (1, 'x'), (2, 'y')")
    s.sql("create view v as select a from t")
    return s


def test_sys_tables():
    s = mk()
    rows = s.sql("select name, type, count from sys.tables order by name").rows
    assert ("t", 0, 2) in rows
    assert ("v", 1, None) in rows


def test_sys_columns():
    s = mk()
    rows = s.sql("select \"table\", name, number from sys.columns "
                 "where \"table\" = 't' order by number").rows
    assert rows == [("t", "a", 0), ("t", "b", 1)]


def test_sys_storage():
    s = mk()
    rows = s.sql("select \"column\", count, sorted, \"key\" from sys.storage "
                 "where \"table\" = 't' order by column").rows
    assert rows[0][0] == "a" and rows[0][1] == 2
    assert rows[0][2] is True and rows[0][3] is True   # 1,2 sorted+key


def test_sys_env_and_queue():
    s = mk()
    rows = dict(s.sql("select name, value from sys.env").rows)
    assert "overflow_checks" in rows and "jax_backend" in rows
    qr = s.sql("select query, status from sys.queue")
    assert any("sys.queue" in q and st == "running" for q, st in qr.rows)
    assert any(st == "finished" for _q, st in qr.rows)


def test_information_schema_alias():
    s = mk()
    r = s.sql("select name from information_schema.tables where type = 0")
    assert r.rows == [("t",)]
