"""Embedded monetdbe-parity API (tools/monetdbe/monetdbe.h surface)."""

import numpy as np

from monetdb_tpu import embedded


def test_query_and_append(tmp_path):
    with embedded.connect() as c:
        c.query("create table t (a int, b varchar(8))")
        res, n = c.query("insert into t values (1, 'x')")
        assert res is None and n == 1
        c.append("t", {"a": np.array([2, 3]),
                       "b": np.array(["y", None], dtype=object)})
        res, n = c.query("select a, b from t order by a")
        assert n == 3
        assert res.rows == [(1, "x"), (2, "y"), (3, None)]
        cols = c.query_columns("select a from t order by a")
        assert list(cols["a"]) == [1, 2, 3]


def test_prepare_execute():
    with embedded.connect() as c:
        c.query("create table t (a int)")
        c.query("insert into t values (1), (2), (3)")
        p = c.prepare("select a from t where a >= ? order by a")
        assert c.execute(p, 2).rows == [(2,), (3,)]
        assert c.execute(p, 3).rows == [(3,)]


def test_transactions_and_dump(tmp_path):
    with embedded.connect(str(tmp_path / "db")) as c:
        c.query("create table t (a int)")
        c.begin()
        c.query("insert into t values (1)")
        c.rollback()
        assert c.query("select count(*) from t")[0].rows == [(0,)]
        c.query("insert into t values (7)")
        out = str(tmp_path / "dump.sql")
        c.dump_database(out)
        text = open(out).read().lower()
        assert "create table" in text and "insert" in text
