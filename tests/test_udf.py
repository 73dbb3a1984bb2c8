"""Python UDFs — CREATE FUNCTION ... LANGUAGE PYTHON (pyapi3 analog,
sql/backends/monet5/UDF/pyapi3)."""

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b float, c varchar(10))")
    s.sql("insert into t values (1, 1.5, 'ab'), (2, 2.5, 'cde'), "
          "(3, 3.5, null)")
    return s


def test_scalar_udf_numeric():
    s = mk()
    s.sql("create function plus7(x int) returns int language python "
          "{ return x + 7 }")
    r = s.sql("select a, plus7(a) from t order by a")
    assert r.rows == [(1, 8), (2, 9), (3, 10)]
    # usable in WHERE too
    r = s.sql("select a from t where plus7(a) > 9")
    assert r.rows == [(3,)]


def test_udf_multi_arg_and_numpy():
    s = mk()
    s.sql("create function hyp(x int, y float) returns float language "
          "python { return np.sqrt(x * x + y * y) }")
    r = s.sql("select hyp(a, b) from t where a = 1")
    assert abs(r.rows[0][0] - (1 + 1.5 ** 2) ** 0.5) < 1e-9


def test_udf_strings():
    s = mk()
    s.sql("create function shout(v varchar(10)) returns varchar(12) "
          "language python "
          "{ return [None if x is None else x.upper() + '!' for x in v] }")
    r = s.sql("select shout(c) from t order by a")
    assert r.rows == [("AB!",), ("CDE!",), (None,)]


def test_udf_drop_and_errors():
    s = mk()
    s.sql("create function one(x int) returns int language python "
          "{ return x }")
    with pytest.raises(Exception):
        s.sql("select one(a, a) from t")     # arity
    s.sql("drop function one")
    with pytest.raises(Exception):
        s.sql("select one(a) from t")


def test_udf_persistence(tmp_path):
    db = Database(str(tmp_path / "db"))
    s = Session(db)
    s.sql("create table t (a int)")
    s.sql("insert into t values (5)")
    s.sql("create function dbl(x int) returns int language python "
          "{ return x * 2 }")
    db.checkpoint()
    db.close()
    s2 = Session(Database(str(tmp_path / "db")))
    assert s2.sql("select dbl(a) from t").rows == [(10,)]


def test_programmatic_udf():
    import numpy as np
    from monetdb_tpu.dtypes import I64
    from monetdb_tpu.udf import UDF
    s = mk()
    s.db.create_function(UDF("sq", lambda x: np.asarray(x) ** 2, I64,
                             ["x"], [I64], body=None))
    assert s.sql("select sq(a) from t order by a").rows \
        == [(1,), (4,), (9,)]
