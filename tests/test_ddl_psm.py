"""DDL & PSM breadth: ALTER TABLE column ops, DEFAULT values, UNIQUE
constraints, statement-level triggers, SQL procedures, COMMENT ON,
ANALYZE, session variables — plus WAL/manifest durability of each
(reference: sql_cat.c sql_alter_table, rel_schema.c create_trigger,
rel_psm.c, sql_parser.y comment_on)."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b varchar(10) default 'dflt', "
          "c int default 7 not null, u int unique)")
    return s


def test_insert_defaults():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10), (2, 20)")
    assert s.sql("select a, b, c from t order by a").rows == \
        [(1, "dflt", 7), (2, "dflt", 7)]


def test_unique_constraint():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    with pytest.raises(ValueError, match="UNIQUE"):
        s.sql("insert into t (a, u) values (2, 10)")
    # NULLs do not collide under UNIQUE
    s.sql("insert into t (a, u) values (3, null), (4, null)")
    assert s.sql("select count(*) from t").rows == [(3,)]


def test_alter_add_column_backfill():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    s.sql("alter table t add column z int default 5")
    assert s.sql("select z from t").rows == [(5,)]
    s.sql("insert into t (a, u) values (2, 20)")   # new rows get default too
    assert s.sql("select z from t order by a").rows == [(5,), (5,)]


def test_alter_add_string_column():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    s.sql("alter table t add column nm varchar(5) default 'x'")
    assert s.sql("select nm from t").rows == [("x",)]
    s.sql("alter table t add column empty varchar(5)")
    assert s.sql("select empty from t").rows == [(None,)]


def test_alter_drop_rename():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    s.sql("alter table t rename column a to aa")
    assert s.sql("select aa from t").rows == [(1,)]
    s.sql("alter table t drop column b")
    with pytest.raises(Exception):
        s.sql("select b from t")
    s.sql("alter table t rename to t2")
    assert s.sql("select aa from t2").rows == [(1,)]
    with pytest.raises(Exception):
        s.sql("select * from t")


def test_trigger_after_insert():
    s = mk()
    s.sql("create table lg (msg varchar(20))")
    s.sql("create trigger tr after insert on t "
          "insert into lg values ('fired')")
    s.sql("insert into t (a, u) values (1, 10)")
    assert s.sql("select count(*) from lg").rows == [(1,)]
    s.sql("drop trigger tr")
    s.sql("insert into t (a, u) values (2, 20)")
    assert s.sql("select count(*) from lg").rows == [(1,)]


def test_trigger_events():
    s = mk()
    s.sql("create table lg (msg varchar(20))")
    s.sql("create trigger tu after update on t "
          "insert into lg values ('upd')")
    s.sql("create trigger td after delete on t "
          "insert into lg values ('del')")
    s.sql("insert into t (a, u) values (1, 10)")
    s.sql("update t set a = 5 where u = 10")
    s.sql("delete from t where u = 10")
    assert sorted(r[0] for r in s.sql("select msg from lg").rows) == \
        ["del", "upd"]


def test_procedure_with_params():
    s = mk()
    s.sql("create table lg (v int)")
    s.sql("create procedure addv(x int) begin "
          "insert into lg values (x); insert into lg values (x + 1); end")
    s.sql("call addv(10)")
    assert s.sql("select v from lg order by v").rows == [(10,), (11,)]
    s.sql("drop procedure addv")


def test_comment_and_syscat():
    s = mk()
    s.sql("comment on table t is 'core table'")
    r = s.sql("select kind, target, remark from sys.comments")
    assert ("table", "t", "core table") in r.rows
    s.sql("create trigger tr after insert on t "
          "insert into t (a, u) values (0, 0)")
    r = s.sql("select name, event from sys.triggers")
    assert ("tr", "insert") in r.rows


def test_session_vars():
    s = mk()
    s.sql("declare lim int")
    s.sql("set lim = 2")
    s.sql("insert into t (a, u) values (1, 10), (2, 20), (3, 30)")
    assert s.sql("select a from t where a <= lim order by a").rows == \
        [(1,), (2,)]
    s.sql("set lim = 1")
    assert s.sql("select a from t where a <= lim").rows == [(1,)]


def test_analyze():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    assert s.sql("analyze sys t") is None
    assert s.sql("select count(*) from t").rows == [(1,)]


def test_durability_wal_and_checkpoint(tmp_path):
    p = str(tmp_path / "db")
    s = Session(Database(p))
    s.sql("create table t (a int, b varchar(8) default 'd')")
    s.sql("insert into t (a) values (1)")
    s.sql("alter table t add column z int default 9")
    s.sql("alter table t rename column a to aa")
    s.sql("create trigger tr after insert on t insert into t (aa) values (99)")
    s.sql("create procedure pp() delete from t where aa = 99")
    s.sql("comment on table t is 'x'")
    s.db.close()
    # WAL replay
    s2 = Session(Database(p))
    assert s2.sql("select aa, b, z from t").rows == [(1, "d", 9)]
    assert "tr" in s2.db.triggers and "pp" in s2.db.procedures
    assert s2.db.comments.get("table:t") == "x"
    # checkpoint → manifest path
    s2.db.checkpoint()
    s2.db.close()
    s3 = Session(Database(p))
    assert s3.sql("select aa, b, z from t").rows == [(1, "d", 9)]
    assert "tr" in s3.db.triggers and "pp" in s3.db.procedures
    s3.sql("insert into t (aa) values (2)")    # trigger fires after replay
    assert s3.sql("select count(*) from t").rows == [(3,)]
    s3.sql("call pp()")
    assert s3.sql("select count(*) from t").rows == [(2,)]
    s3.db.close()


def test_rollback_alter():
    s = mk()
    s.sql("insert into t (a, u) values (1, 10)")
    s.sql("begin transaction")
    s.sql("alter table t add column z int default 3")
    s.sql("rollback")
    with pytest.raises(Exception):
        s.sql("select z from t")
