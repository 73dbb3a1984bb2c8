"""FOREIGN KEY enforcement (sql_cat.c fkey DDL; RESTRICT semantics):
insert-side membership, delete-side restrict, nil FK pass, transaction
visibility, ALTER ADD CONSTRAINT, WAL persistence."""

import numpy as np
import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


@pytest.fixture
def db():
    return Database()


def _schema(s):
    s.sql("create table p (id int primary key, nm varchar(8))")
    s.sql("create table c (id int, pid int, "
          "foreign key (pid) references p (id))")
    s.sql("insert into p values (1, 'a'), (2, 'b')")


def test_insert_and_delete_restrict(db):
    s = Session(db)
    _schema(s)
    s.sql("insert into c values (10, 1)")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("insert into c values (11, 9)")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("delete from p where id = 1")
    s.sql("delete from p where id = 2")          # unreferenced: fine
    s.sql("insert into c values (12, null)")     # nil FK allowed
    s.sql("delete from c")
    s.sql("delete from p")                       # children gone: fine


def test_references_defaults_to_parent_pk(db):
    s = Session(db)
    s.sql("create table p (id int primary key)")
    s.sql("create table c (pid int references p)")
    s.sql("insert into p values (5)")
    s.sql("insert into c values (5)")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("insert into c values (6)")


def test_alter_add_constraint_fk(db):
    s = Session(db)
    s.sql("create table p (id int primary key)")
    s.sql("create table c (pid int)")
    s.sql("insert into p values (1)")
    s.sql("alter table c add constraint c_fk foreign key (pid) "
          "references p (id)")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s.sql("insert into c values (7)")


def test_fk_inside_transaction_sees_txn_parent(db):
    """COPY-style bulk loads run inside one transaction; the child's
    check must see parent rows inserted earlier in the same txn (the
    TPC-H one.test.in load order)."""
    s = Session(db)
    s.sql("start transaction")
    s.sql("create table p (id int primary key)")
    s.sql("create table c (pid int, foreign key (pid) references p)")
    s.sql("insert into p values (1), (2)")
    s.sql("insert into c values (1)")
    s.sql("commit")
    assert s.sql("select count(*) from c").rows == [(1,)]


def test_fk_survives_wal_replay(tmp_path, db):
    d = str(tmp_path / "db")
    db1 = Database(d)
    s = Session(db1)
    s.sql("create table p (id int primary key)")
    s.sql("create table c (pid int, foreign key (pid) references p)")
    s.sql("insert into p values (1)")
    db1.close()
    db2 = Database(d)
    s2 = Session(db2)
    with pytest.raises(Exception, match="FOREIGN KEY"):
        s2.sql("insert into c values (9)")
    s2.sql("insert into c values (1)")
