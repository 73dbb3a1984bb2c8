"""Regressions for the round-3 advisor findings (ADVICE.md r3):
blob nil length, blob literal validation at every entry point, NATURAL
JOIN / USING column coalescing, CREATE VIEW column-alias lists, and
sequence bound persistence across WAL replay."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_blob_length_null_row():
    # interpreter fallback used to halve the nil sentinel: INT32_MIN//2
    # leaked out as -1073741824 instead of NULL (executor length path)
    s = Session(Database())
    s.sql("create table b (x blob)")
    s.sql("insert into b values ('AABB'), (NULL)")
    r = s.sql("select cast(length(x) as varchar(10)) from b")
    assert sorted(r.rows, key=lambda t: (t[0] is None, t[0])) == \
        [("2",), (None,)]
    r2 = s.sql("select octet_length(x) from b")
    assert sorted(r2.rows, key=lambda t: (t[0] is None, t[0])) == \
        [(2,), (None,)]


def test_blob_insert_validates_and_canonicalizes():
    # direct INSERT routes through the same validation as CAST
    # (blobFromStr rejects invalid literals with 22M28 and uppercases)
    s = Session(Database())
    s.sql("create table b (x blob)")
    with pytest.raises(Exception, match="22M28"):
        s.sql("insert into b values ('xyz!')")
    with pytest.raises(Exception, match="22M28"):
        s.sql("insert into b values ('abc')")     # odd length
    s.sql("insert into b values ('aabb')")
    assert s.sql("select x from b").rows == [("AABB",)]


def test_join_using_coalesces_columns():
    s = Session(Database())
    s.sql("create table l (id int, a int)")
    s.sql("create table r (id int, b int)")
    s.sql("insert into l values (1, 10), (2, 20)")
    s.sql("insert into r values (1, 100), (3, 300)")
    res = s.sql("select * from l join r using (id) order by id")
    assert [c for c in res.names] == ["id", "a", "b"]
    assert res.rows == [(1, 10, 100)]
    # unqualified reference to the USING column resolves (to the left)
    res2 = s.sql("select id from l join r using (id)")
    assert res2.rows == [(1,)]
    # qualified access to either side still works
    res3 = s.sql("select l.id, r.id from l join r using (id)")
    assert res3.rows == [(1, 1)]


def test_natural_join_coalesces_columns():
    s = Session(Database())
    s.sql("create table l (id int, a int)")
    s.sql("create table r (id int, b int)")
    s.sql("insert into l values (1, 10), (2, 20)")
    s.sql("insert into r values (2, 200)")
    res = s.sql("select * from l natural join r")
    assert [c for c in res.names] == ["id", "a", "b"]
    assert res.rows == [(2, 20, 200)]
    assert s.sql("select id + b from l natural join r").rows == [(202,)]


def test_create_view_column_aliases():
    s = Session(Database())
    s.sql("create table t (x int, y int)")
    s.sql("insert into t values (1, 2)")
    s.sql("create view v (c1, c2) as select x, y from t")
    assert s.sql("select c1, c2 from v").rows == [(1, 2)]
    assert s.sql("select * from v").names == ["c1", "c2"]
    # arity mismatch is rejected at DDL time, not silently accepted
    with pytest.raises(Exception):
        s.sql("create view w (a, b, c) as select x, y from t")


def test_sequence_bounds_survive_restart(tmp_path):
    db = Database(str(tmp_path / "farm"))
    s = Session(db)
    s.sql("create sequence sq start with 1 increment by 1 maxvalue 3")
    assert s.sql("select next value for sq").rows == [(1,)]
    db2 = Database(str(tmp_path / "farm"))   # replay WAL
    s2 = Session(db2)
    assert s2.sql("select next value for sq").rows == [(2,)]
    assert s2.sql("select next value for sq").rows == [(3,)]
    with pytest.raises(Exception):
        s2.sql("select next value for sq")   # MAXVALUE enforced post-replay
