"""Regressions for the round-4 advisor findings (ADVICE.md r4):
FK enforcement inside transactions (delete/cascade), UPDATE-path
FK/PK/UNIQUE/NOT NULL checks, txn-staged FOREIGN KEY registration
(no phantom constraint after ROLLBACK), cascade copy-on-write under
open snapshots, and sqllogic statement splitting (DROP TABLE IF
EXISTS / END IF / END WHILE depth tracking)."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_txn_fk_delete_enforced():
    s = Session(Database())
    s.sql("create table p (id int primary key)")
    s.sql("create table c (id int, pid int, "
          "foreign key (pid) references p(id))")
    s.sql("insert into p values (1), (2)")
    s.sql("insert into c values (10, 1)")
    s.sql("start transaction")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("delete from p where id = 1")
    s.sql("rollback")


def test_txn_cascade_and_rollback():
    s = Session(Database())
    s.sql("create table p2 (id int primary key)")
    s.sql("create table c2 (id int, pid int, foreign key (pid) "
          "references p2(id) on delete cascade)")
    s.sql("insert into p2 values (1), (2)")
    s.sql("insert into c2 values (10, 1), (11, 2)")
    s.sql("start transaction")
    s.sql("delete from p2 where id = 1")
    assert s.sql("select count(*) from c2").rows[0][0] == 1
    s.sql("rollback")
    assert s.sql("select count(*) from c2").rows[0][0] == 2
    # and the cascade commits when the txn commits
    s.sql("start transaction")
    s.sql("delete from p2 where id = 1")
    s.sql("commit")
    assert s.sql("select count(*) from c2").rows[0][0] == 1


def test_update_pk_violation():
    s = Session(Database())
    s.sql("create table u (id int primary key, v int)")
    s.sql("insert into u values (1, 10), (2, 20)")
    with pytest.raises(Exception, match="PRIMARY KEY"):
        s.sql("update u set id = 2 where id = 1")
    # non-violating update still works
    s.sql("update u set id = 3 where id = 1")
    assert sorted(r[0] for r in s.sql("select id from u").rows) == [2, 3]


def test_update_unique_violation():
    s = Session(Database())
    s.sql("create table uq (id int, v int unique)")
    s.sql("insert into uq values (1, 10), (2, 20)")
    with pytest.raises(Exception, match="UNIQUE"):
        s.sql("update uq set v = 20 where id = 1")
    # NULLs never collide under UNIQUE
    s.sql("update uq set v = NULL")
    assert s.sql("select count(*) from uq").rows[0][0] == 2


def test_update_notnull_violation():
    s = Session(Database())
    s.sql("create table nn (id int, v int not null)")
    s.sql("insert into nn values (1, 10)")
    with pytest.raises(Exception, match="NOT NULL"):
        s.sql("update nn set v = NULL where id = 1")


def test_update_fk_child_and_parent():
    s = Session(Database())
    s.sql("create table pp (id int primary key)")
    s.sql("create table cc (pid int, foreign key (pid) references pp(id))")
    s.sql("insert into pp values (1)")
    s.sql("insert into cc values (1)")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("update cc set pid = 99")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("update pp set id = 5")
    # updating the child key to NULL or a valid parent is fine
    s.sql("update cc set pid = NULL")
    s.sql("update pp set id = 5")     # no longer referenced


def test_no_phantom_fk_after_rollback():
    s = Session(Database())
    s.sql("create table par (id int primary key)")
    s.sql("insert into par values (1)")
    s.sql("start transaction")
    s.sql("create table c (x int, pid int, "
          "foreign key (pid) references par(id))")
    s.sql("rollback")
    s.sql("create table c (x int)")
    s.sql("insert into c values (42)")
    assert s.sql("select * from c").rows == [(42,)]


def test_staged_fk_enforced_in_txn_and_committed():
    s = Session(Database())
    s.sql("create table par (id int primary key)")
    s.sql("insert into par values (1)")
    s.sql("start transaction")
    s.sql("create table ch (pid int, "
          "foreign key (pid) references par(id))")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("insert into ch values (9)")
    s.sql("rollback")
    # committed txn installs the constraint for later sessions
    s.sql("start transaction")
    s.sql("create table ch (pid int, "
          "foreign key (pid) references par(id))")
    s.sql("commit")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("insert into ch values (9)")
    s.sql("insert into ch values (1)")


def test_cascade_honors_open_snapshots():
    db = Database()
    a, b = Session(db), Session(db)
    a.sql("create table p3 (id int primary key)")
    a.sql("create table c3 (pid int, foreign key (pid) "
          "references p3(id) on delete cascade)")
    a.sql("insert into p3 values (1)")
    a.sql("insert into c3 values (1)")
    b.sql("start transaction")
    assert b.sql("select count(*) from c3").rows[0][0] == 1
    a.sql("delete from p3 where id = 1")
    # the open snapshot must not see the cascade (copy-on-write)
    assert b.sql("select count(*) from c3").rows[0][0] == 1
    b.sql("commit")
    assert a.sql("select count(*) from c3").rows[0][0] == 0


def test_split_stmts_if_exists_and_end_if():
    from monetdb_tpu.testing.sqllogic import SqlLogicRunner
    parts = SqlLogicRunner._split_stmts(
        "DROP TABLE IF EXISTS t; CREATE TABLE t (i int); "
        "INSERT INTO t VALUES (1)")
    assert len(parts) == 3
    parts = SqlLogicRunner._split_stmts(
        "create function f() returns int begin declare x int; "
        "set x = 0; while x < 3 do set x = x + 1; end while; "
        "if x > 2 then set x = 9; end if; return x; end; select 1")
    assert len(parts) == 2
