"""ROLLUP / CUBE / GROUPING SETS (reference: rel_select.c group-by
extensions; lowered to a union of groupings)."""

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (r varchar(2), c varchar(2), v int)")
    s.sql("insert into t values ('a', 'x', 1), ('a', 'y', 2), "
          "('b', 'x', 4), ('b', 'y', 8)")
    return s


def test_rollup():
    s = mk()
    r = s.sql("select r, c, sum(v) from t group by rollup(r, c) "
              "order by r, c")
    rows = set(r.rows)
    assert ("a", "x", 1) in rows and ("b", "y", 8) in rows   # full
    assert ("a", None, 3) in rows and ("b", None, 12) in rows  # per-r
    assert (None, None, 15) in rows                           # grand total
    assert len(rows) == 7


def test_cube():
    s = mk()
    r = s.sql("select r, c, sum(v) from t group by cube(r, c)")
    rows = set(r.rows)
    assert (None, "x", 5) in rows and (None, "y", 10) in rows
    assert ("a", None, 3) in rows
    assert (None, None, 15) in rows
    assert len(rows) == 9


def test_grouping_sets_explicit():
    s = mk()
    r = s.sql("select r, c, count(*) from t "
              "group by grouping sets ((r), (c), ())")
    rows = set(r.rows)
    assert ("a", None, 2) in rows and (None, "x", 2) in rows
    assert (None, None, 4) in rows
    assert len(rows) == 5


def test_rollup_with_having_and_order():
    s = mk()
    r = s.sql("select r, sum(v) from t group by rollup(r) "
              "having sum(v) > 3 order by 2")
    assert r.rows == [(  "b", 12), (None, 15)]
