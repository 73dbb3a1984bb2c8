"""Snapshot-isolation MVCC across concurrent sessions — the analog of the
reference's transaction store (sql/storage/store.c sql_trans_create:3889,
commit validation :3980; tested there by multi-connection sqllogictests,
@connection(id=...) directives)."""

import numpy as np
import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage.database import (ConcurrencyConflict, Database,
                                          Transaction)


def _two():
    db = Database()
    s1, s2 = Session(db), Session(db)
    s1.sql("create table t (a int, b int)")
    s1.sql("insert into t values (1,10),(2,20)")
    return db, s1, s2


def test_snapshot_isolation_reads():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    assert s1.sql("select * from t").rows == [(1, 10), (2, 20)]
    s2.sql("insert into t values (3,30)")
    # s2 (autocommit) sees its write; s1 keeps its begin-time snapshot
    assert len(s2.sql("select * from t").rows) == 3
    assert s1.sql("select * from t").rows == [(1, 10), (2, 20)]
    s1.sql("commit")
    assert len(s1.sql("select * from t").rows) == 3


def test_write_write_conflict_first_committer_wins():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("update t set b = 99 where a = 1")
    s2.sql("update t set b = 55 where a = 2")
    with pytest.raises(ConcurrencyConflict):
        s1.sql("commit")
    # the conflicting txn left no trace; s2's write survives
    assert sorted(s1.sql("select * from t").rows) == [(1, 10), (2, 55)]


def test_concurrent_txns_disjoint_tables_both_commit():
    db, s1, s2 = _two()
    s1.sql("create table u (x int)")
    s1.sql("start transaction")
    s2.sql("start transaction")
    s1.sql("insert into t values (3,30)")
    s2.sql("insert into u values (7)")
    s1.sql("commit")
    s2.sql("commit")
    assert len(s1.sql("select * from t").rows) == 3
    assert s2.sql("select * from u").rows == [(7,)]


def test_concurrent_txns_same_table_second_aborts():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s2.sql("start transaction")
    s1.sql("insert into t values (3,30)")
    s2.sql("insert into t values (4,40)")
    s1.sql("commit")
    with pytest.raises(ConcurrencyConflict):
        s2.sql("commit")
    assert sorted(s1.sql("select * from t").rows) == \
        [(1, 10), (2, 20), (3, 30)]


def test_rollback_discards_all_changes():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("delete from t where a = 1")
    s1.sql("update t set b = 0 where a = 2")
    s1.sql("insert into t values (9,90)")
    assert sorted(s1.sql("select * from t").rows) == [(2, 0), (9, 90)]
    s1.sql("rollback")
    assert sorted(s1.sql("select * from t").rows) == [(1, 10), (2, 20)]


def test_transactional_ddl_visibility():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("create table u (x int)")
    s1.sql("insert into u values (7)")
    assert s1.sql("select * from u").rows == [(7,)]
    with pytest.raises(Exception):
        s2.sql("select * from u")
    s1.sql("commit")
    assert s2.sql("select * from u").rows == [(7,)]


def test_transactional_ddl_rollback():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("create table u (x int)")
    s1.sql("insert into u values (7)")
    s1.sql("rollback")
    with pytest.raises(Exception):
        s1.sql("select * from u")
    # name is free again
    s1.sql("create table u (x int)")
    assert s1.sql("select * from u").rows == []


def test_drop_table_in_txn():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("drop table t")
    with pytest.raises(Exception):
        s1.sql("select * from t")
    # other sessions still see it until commit
    assert len(s2.sql("select * from t").rows) == 2
    s1.sql("commit")
    with pytest.raises(Exception):
        s2.sql("select * from t")


def test_txn_wal_group_commit_and_replay(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path)
    s = Session(db)
    s.sql("create table t (a int)")
    s.sql("start transaction")
    s.sql("insert into t values (1)")
    s.sql("insert into t values (2)")
    s.sql("commit")
    s.sql("start transaction")
    s.sql("insert into t values (3)")
    s.sql("rollback")
    db.close()
    db2 = Database(path)
    s2 = Session(db2)
    # committed group replays, rolled-back records never hit the WAL
    assert sorted(s2.sql("select * from t").rows) == [(1,), (2,)]
    db2.close()


def test_plan_cache_not_poisoned_by_txn_schema():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    s1.sql("create table u (x int)")
    s1.sql("insert into u values (1)")
    assert s1.sql("select * from u").rows == [(1,)]
    s1.sql("rollback")
    s1.sql("create table u (x varchar(5))")
    s1.sql("insert into u values ('hi')")
    assert s1.sql("select * from u").rows == [("hi",)]


def test_repeatable_read_within_txn():
    db, s1, s2 = _two()
    s1.sql("start transaction")
    before = s1.sql("select sum(b) from t").rows
    s2.sql("update t set b = b + 1000 where a = 1")
    after = s1.sql("select sum(b) from t").rows
    assert before == after == [(30,)]
    s1.sql("commit")
