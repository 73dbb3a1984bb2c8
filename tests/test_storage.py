"""Persistence & DML tests — WAL replay, atomic checkpoint, delta
visibility, transactions, COPY INTO (reference behaviors: gdk_logger
replay, BBPsync manifest swap, bat_storage deltas, store.c transactions)."""

import datetime
import os
from decimal import Decimal

import numpy as np
import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mkdb(tmp_path, name="db"):
    return Database(str(tmp_path / name))


def test_create_insert_select(tmp_path):
    s = Session(mkdb(tmp_path))
    s.sql("create table t (a int, b decimal(10,2), c varchar(20), d date)")
    n = s.sql("insert into t values (1, 2.50, 'x', date '2020-01-02'), "
              "(2, 3.75, 'y', date '2021-03-04'), (3, 1.25, 'x', null)")
    assert n == 3
    r = s.sql("select a, b, c, d from t order by a")
    assert r.rows[0] == (1, Decimal("2.50"), "x", datetime.date(2020, 1, 2))
    assert r.rows[2][3] is None
    r2 = s.sql("select c, sum(b) as s from t group by c order by c")
    assert r2.rows == [("x", Decimal("3.75")), ("y", Decimal("3.75"))]


def test_delete_update(tmp_path):
    s = Session(mkdb(tmp_path))
    s.sql("create table t (a int, b int)")
    s.sql("insert into t values (1, 10), (2, 20), (3, 30), (4, 40)")
    assert s.sql("delete from t where a >= 3") == 2
    r = s.sql("select a from t order by a")
    assert [x[0] for x in r.rows] == [1, 2]
    assert s.sql("update t set b = b + 5 where a = 2") == 1
    r = s.sql("select a, b from t order by a")
    assert r.rows == [(1, 10), (2, 25)]
    # insert after delete: new rows visible, deleted rows stay gone
    s.sql("insert into t values (5, 50)")
    r = s.sql("select a from t order by a")
    assert [x[0] for x in r.rows] == [1, 2, 5]


def test_string_dict_growth(tmp_path):
    s = Session(mkdb(tmp_path))
    s.sql("create table t (k int, s varchar(10))")
    s.sql("insert into t values (1, 'mango'), (2, 'apple')")
    s.sql("insert into t values (3, 'banana')")   # forces dict remap
    r = s.sql("select s from t order by s")
    assert [x[0] for x in r.rows] == ["apple", "banana", "mango"]
    r = s.sql("select k from t where s > 'apple' order by k")
    assert [x[0] for x in r.rows] == [1, 3]


def test_wal_replay(tmp_path):
    db = mkdb(tmp_path)
    s = Session(db)
    s.sql("create table t (a int, b varchar(5))")
    s.sql("insert into t values (1, 'a'), (2, 'b')")
    s.sql("delete from t where a = 1")
    s.sql("update t set b = 'z' where a = 2")
    db.close()
    # no checkpoint was taken: state must come back from the WAL alone
    db2 = Database(str(tmp_path / "db"))
    r = Session(db2).sql("select a, b from t")
    assert r.rows == [(2, "z")]


def test_checkpoint_and_reopen(tmp_path):
    db = mkdb(tmp_path)
    s = Session(db)
    s.sql("create table t (a int)")
    s.sql("insert into t values (1), (2)")
    db.checkpoint()
    s.sql("insert into t values (3)")     # goes to WAL only
    db.close()
    db2 = Database(str(tmp_path / "db"))
    r = Session(db2).sql("select a from t order by a")
    assert [x[0] for x in r.rows] == [1, 2, 3]
    assert os.path.exists(str(tmp_path / "db" / "manifest.json"))


def test_transactions(tmp_path):
    s = Session(mkdb(tmp_path))
    s.sql("create table t (a int)")
    s.sql("insert into t values (1)")
    s.sql("begin")
    s.sql("insert into t values (2)")
    s.sql("delete from t where a = 1")
    assert [x[0] for x in s.sql("select a from t").rows] == [2]
    s.sql("rollback")
    assert [x[0] for x in s.sql("select a from t").rows] == [1]
    s.sql("begin transaction")
    s.sql("insert into t values (5)")
    s.sql("commit")
    assert sorted(x[0] for x in s.sql("select a from t").rows) == [1, 5]


def test_txn_rollback_not_replayed(tmp_path):
    db = mkdb(tmp_path)
    s = Session(db)
    s.sql("create table t (a int)")
    s.sql("begin")
    s.sql("insert into t values (9)")
    s.sql("rollback")
    db.close()
    db2 = Database(str(tmp_path / "db"))
    assert Session(db2).sql("select count(*) as n from t").rows == [(0,)]


def test_snapshot_restore(tmp_path):
    db = mkdb(tmp_path)
    s = Session(db)
    s.sql("create table t (a int, s varchar(5))")
    s.sql("insert into t values (7, 'q')")
    tar = str(tmp_path / "snap.tar")
    db.snapshot(tar)
    db2 = Database.restore(tar, str(tmp_path / "restored"))
    assert Session(db2).sql("select a, s from t").rows == [(7, "q")]


def test_copy_into(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("1|2.50|hello|2020-05-06\n2|3.00|world|2021-07-08\n")
    s = Session(mkdb(tmp_path))
    s.sql("create table t (a int, b decimal(8,2), c varchar(10), d date)")
    n = s.sql(f"copy into t from '{p}'")
    assert n == 2
    r = s.sql("select a, b, c, d from t order by a")
    assert r.rows[1] == (2, Decimal("3.00"), "world",
                         datetime.date(2021, 7, 8))


def test_insert_select(tmp_path):
    s = Session(mkdb(tmp_path))
    s.sql("create table src (a int, b int)")
    s.sql("insert into src values (1, 2), (3, 4)")
    s.sql("create table dst (a int, b int)")
    assert s.sql("insert into dst select a, b from src where a > 1") == 1
    assert s.sql("select a, b from dst").rows == [(3, 4)]


def test_for_compression_at_rest(tmp_path):
    """Int columns with a narrow range store as base+deltas on disk
    (for.c analog); values round-trip exactly."""
    import json
    import os

    import numpy as np

    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database

    db = Database(str(tmp_path / "db"))
    s = Session(db)
    s.sql("create table t (big bigint, nilly int, wide bigint)")
    s.sql("insert into t values (5000000000, 1, 0), "
          "(5000000900, null, 9223372036854775000)")
    db.checkpoint()
    man = json.load(open(tmp_path / "db" / "manifest.json"))
    fors = man["tables"]["t"]["for"]
    assert "big" in fors            # 900 span → compressed
    assert "nilly" not in fors      # has nil → untouched
    assert "wide" not in fors       # span too large
    stored = np.load(tmp_path / "db" / "data" / "t.big.npy")
    assert stored.dtype == np.int16
    db.close()
    db2 = Database(str(tmp_path / "db"))
    r = Session(db2).sql("select big from t order by big")
    assert r.rows == [(5000000000,), (5000000900,)]
    db2.close()
