"""Sequences, serial columns, NOT NULL / PRIMARY KEY enforcement
(reference: sql/storage/store_sequence.c, bat_storage key checks)."""

import pytest

from monetdb_tpu.dump import dump_sql, restore_sql
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_sequence_ddl_and_nextval():
    s = Session(Database())
    s.sql("create sequence sq start with 10 increment by 5")
    s.sql("create table t (a int)")
    s.sql("insert into t values (next value for sq), (next value for sq)")
    assert s.sql("select a from t order by a").rows == [(10,), (15,)]
    # in a SELECT: one value per row
    r = s.sql("select next value for sq from t order by 1")
    assert r.rows == [(20,), (25,)]
    s.sql("drop sequence sq")
    with pytest.raises(Exception):
        s.sql("insert into t values (next value for sq)")


def test_serial_autofill():
    s = Session(Database())
    s.sql("create table t (id serial, nm varchar(5))")
    s.sql("insert into t values ('a'), ('b')")          # id omitted
    s.sql("insert into t (nm) values ('c')")
    r = s.sql("select id, nm from t order by id")
    assert r.rows == [(1, "a"), (2, "b"), (3, "c")]
    # serial is a primary key: duplicate explicit id rejected
    with pytest.raises(Exception):
        s.sql("insert into t (id, nm) values (2, 'dup')")


def test_not_null_enforced():
    s = Session(Database())
    s.sql("create table t (a int not null, b int)")
    s.sql("insert into t values (1, null)")
    with pytest.raises(Exception):
        s.sql("insert into t values (null, 2)")
    assert s.sql("select count(*) from t").rows == [(1,)]


def test_primary_key_enforced():
    s = Session(Database())
    s.sql("create table t (k int primary key, v int)")
    s.sql("insert into t values (1, 10), (2, 20)")
    with pytest.raises(Exception):
        s.sql("insert into t values (2, 99)")
    with pytest.raises(Exception):
        s.sql("insert into t values (3, 1), (3, 2)")   # dup within batch
    # composite key
    s.sql("create table c (a int, b varchar(3), v int, primary key (a, b))")
    s.sql("insert into c values (1, 'x', 0), (1, 'y', 0)")
    with pytest.raises(Exception):
        s.sql("insert into c values (1, 'x', 9)")


def test_sequence_persistence_and_dump(tmp_path):
    db = Database(str(tmp_path / "db"))
    s = Session(db)
    s.sql("create table t (id serial, nm varchar(5))")
    s.sql("insert into t values ('a'), ('b')")
    db.close()
    # WAL replay must not reissue ids
    db2 = Database(str(tmp_path / "db"))
    s2 = Session(db2)
    s2.sql("insert into t values ('c')")
    assert s2.sql("select id from t order by id").rows \
        == [(1,), (2,), (3,)]
    # dump/restore keeps sequence state and constraints
    db3 = Database()
    restore_sql(db3, dump_sql(db2))
    s3 = Session(db3)
    s3.sql("insert into t values ('d')")
    assert s3.sql("select max(id) from t").rows == [(4,)]
    with pytest.raises(Exception):
        s3.sql("insert into t (id, nm) values (1, 'dup')")
    db2.close()
