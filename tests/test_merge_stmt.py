"""MERGE INTO statement (sql_parser.y merge_stmt, rel_updates.c merge
plans): matched update/delete, not-matched insert, subquery sources,
multiple-match error, and transaction interaction."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage.database import Database


def mk():
    s = Session(Database())
    s.sql("create table tgt (id int, v int)")
    s.sql("insert into tgt values (1,10),(2,20),(3,30)")
    s.sql("create table src (id int, v int)")
    s.sql("insert into src values (2,200),(3,300),(4,400)")
    return s


def test_merge_upsert():
    s = mk()
    n = s.sql("merge into tgt using src on tgt.id = src.id "
              "when matched then update set v = src.v "
              "when not matched then insert values (src.id, src.v)")
    assert n == 3
    assert sorted(s.sql("select * from tgt").rows) == \
        [(1, 10), (2, 200), (3, 300), (4, 400)]


def test_merge_delete():
    s = mk()
    n = s.sql("merge into tgt using src on tgt.id = src.id "
              "when matched then delete")
    assert n == 2
    assert sorted(s.sql("select * from tgt").rows) == [(1, 10)]


def test_merge_insert_only_with_columns():
    s = mk()
    n = s.sql("merge into tgt using src on tgt.id = src.id "
              "when not matched then insert (id, v) "
              "values (src.id, src.v * 2)")
    assert n == 1
    assert (4, 800) in s.sql("select * from tgt").rows


def test_merge_subquery_source():
    s = mk()
    n = s.sql("merge into tgt t using "
              "(select id + 1 as k, v as nv from src where id < 3) u "
              "on t.id = u.k when matched then update set v = u.nv")
    assert n == 1
    assert (3, 200) in s.sql("select * from tgt").rows


def test_merge_multiple_match_error():
    s = mk()
    s.sql("insert into src values (2, 999)")
    with pytest.raises(ValueError, match="40002"):
        s.sql("merge into tgt using src on tgt.id = src.id "
              "when matched then update set v = 0")


def test_merge_update_expression_uses_both_sides():
    s = mk()
    s.sql("merge into tgt using src on tgt.id = src.id "
          "when matched then update set v = tgt.v + src.v")
    assert sorted(s.sql("select * from tgt").rows) == \
        [(1, 10), (2, 220), (3, 330)]


def test_merge_in_transaction_rolls_back():
    s = mk()
    s.sql("start transaction")
    s.sql("merge into tgt using src on tgt.id = src.id "
          "when matched then delete "
          "when not matched then insert values (src.id, src.v)")
    assert sorted(s.sql("select * from tgt").rows) == [(1, 10), (4, 400)]
    s.sql("rollback")
    assert sorted(s.sql("select * from tgt").rows) == \
        [(1, 10), (2, 20), (3, 30)]
