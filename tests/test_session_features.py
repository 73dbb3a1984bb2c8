"""Session-level features: EXPLAIN/PLAN/TRACE statements, prepared
statements with ? parameters, plan cache behavior."""

import datetime
from decimal import Decimal

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b decimal(8,2), c varchar(10))")
    s.sql("insert into t values (1, 1.50, 'x'), (2, 2.50, 'y'), "
          "(3, 3.50, 'x')")
    return s


def test_explain():
    s = mk()
    r = s.sql("explain select a from t where b > 2.00 order by a")
    text = "\n".join(row[0] for row in r.rows)
    assert "Scan t" in text and "Filter" in text and "OrderBy" in text


def test_trace():
    s = mk()
    r = s.sql("trace select c, sum(b) from t group by c")
    assert r.names == ["usec", "rows", "algorithm", "statement"]
    # TRACE reports the path that actually runs: the fused fragment
    assert any(row[3] == "fragment.run" and row[2] == "fragment:jit"
               for row in r.rows)


def test_trace_operator_path():
    from monetdb_tpu import config
    config.set("fragment_exec", False)
    try:
        s = mk()
        r = s.sql("trace select c, sum(b) from t group by c")
        assert any("GroupBy" in row[3] for row in r.rows)
        assert any(row[2].startswith("group:") for row in r.rows)
    finally:
        config.reset("fragment_exec")


def test_prepared():
    s = mk()
    p = s.prepare("select a, b from t where a >= ? and c = ? order by a")
    assert p.n_params == 2
    r = p.run(2, "x")
    assert r.rows == [(3, Decimal("3.50"))]
    r = p.run(1, "y")
    assert r.rows == [(2, Decimal("2.50"))]


def test_plan_cache_invalidation():
    s = mk()
    q = "select count(*) from t"
    assert s.sql(q).rows == [(3,)]
    assert len(s._plan_cache) == 1
    s.sql(q)
    assert len(s._plan_cache) == 1     # cache hit, no regrow
    # data change: cached plan still valid
    s.sql("insert into t values (4, 9.99, 'z')")
    assert s.sql(q).rows == [(4,)]
    # schema change invalidates (epoch bump)
    s.sql("create table u (x int)")
    assert s.sql(q).rows == [(4,)]


def test_views():
    s = mk()
    s.sql("create view v as select c, sum(b) as total from t group by c")
    r = s.sql("select c, total from v where total > 2.00 order by c")
    assert r.rows == [("x", Decimal("5.00")), ("y", Decimal("2.50"))]
    # views compose with joins and aliases
    r = s.sql("select v.c, t.a from v join t on v.c = t.c order by t.a")
    assert [row[1] for row in r.rows] == [1, 2, 3]
    s.sql("drop view v")
    try:
        s.sql("select * from v")
        assert False, "expected bind error"
    except Exception:
        pass


def test_view_persistence(tmp_path):
    db = Database(str(tmp_path / "db"))
    s = Session(db)
    s.sql("create table t (a int)")
    s.sql("insert into t values (1), (2), (3)")
    s.sql("create view big as select a from t where a > 1")
    db.checkpoint()
    db.close()
    db2 = Database(str(tmp_path / "db"))
    r = Session(db2).sql("select count(*) from big")
    assert r.rows == [(2,)]


def test_prepared_dml():
    s = mk()
    ins = s.prepare("insert into t values (?, ?, ?)")
    assert ins.run(9, Decimal("9.99"), "z") == 1
    upd = s.prepare("update t set c = ? where a = ?")
    assert upd.run("zz", 9) == 1
    dele = s.prepare("delete from t where a = ?")
    assert dele.run(9) == 1
    assert s.sql("select count(*) from t").rows == [(3,)]
