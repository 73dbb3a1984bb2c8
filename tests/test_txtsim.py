"""Text-similarity functions (reference: monetdb5/modules/mal/txtsim.c)."""

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (id int, nm varchar(20))")
    s.sql("insert into t values (1, 'kitten'), (2, 'sitting'), "
          "(3, 'Robert'), (4, null)")
    return s


def test_levenshtein():
    s = mk()
    r = s.sql("select id, levenshtein(nm, 'kitten') from t order by id")
    assert r.rows == [(1, 0), (2, 3), (3, 6), (4, None)]
    # symmetric argument order
    r = s.sql("select levenshtein('kitten', nm) from t where id = 2")
    assert r.rows == [(3,)]


def test_editdistance_transposition():
    s = Session(Database())
    s.sql("create table t (a varchar(5))")
    s.sql("insert into t values ('ca')")
    assert s.sql("select editdistance(a, 'ac') from t").rows == [(1,)]
    assert s.sql("select levenshtein(a, 'ac') from t").rows == [(2,)]


def test_jarowinkler_and_filter():
    s = mk()
    r = s.sql("select id from t where jarowinkler(nm, 'kittne') > 0.9 "
              "order by id")
    assert r.rows == [(1,)]


def test_soundex_difference():
    s = mk()
    assert s.sql("select soundex(nm) from t where id = 3").rows \
        == [("R163",)]
    assert s.sql("select difference(nm, 'Rupert') from t where id = 3") \
        .rows == [(4,)]


def test_qgramnormalize():
    s = Session(Database())
    s.sql("create table t (a varchar(20))")
    s.sql("insert into t values ('foo-bar  9x')")
    assert s.sql("select qgramnormalize(a) from t").rows \
        == [("FOO BAR 9X",)]
