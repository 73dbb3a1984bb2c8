"""JSON functions (reference: monetdb5/modules/atoms/json.c)."""

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table j (id int, js varchar(100))")
    s.sql("""insert into j values
        (1, '{"a": 1, "b": {"c": [10, 20, 30]}}'),
        (2, '[1, 2, 3]'),
        (3, 'not json'),
        (4, null)""")
    return s


def test_isvalid():
    s = mk()
    r = s.sql("select id, json_isvalid(js) from j order by id")
    assert [x[1] for x in r.rows] == [True, True, False, False]


def test_filter():
    s = mk()
    r = s.sql("select json_filter(js, '$.b.c[1]') from j where id = 1")
    assert r.rows == [("20",)]
    r = s.sql("select json_filter(js, '$.b.c[*]') from j where id = 1")
    assert r.rows == [("[10,20,30]",)]
    r = s.sql("select json_filter(js, '$[0]') from j where id = 2")
    assert r.rows == [("1",)]
    r = s.sql("select json_filter(js, '$.missing') from j where id = 1")
    assert r.rows == [("[]",)]


def test_text_length_keys():
    s = mk()
    assert s.sql("select json_text(js) from j where id = 1").rows \
        == [("1 10 20 30",)]
    r = s.sql("select id, json_length(js) from j where id < 3 order by id")
    assert r.rows == [(1, 2), (2, 3)]
    assert s.sql("select json_keyarray(js) from j where id = 1").rows \
        == [('["a","b"]',)]
    assert s.sql("select json_valuearray(js) from j where id = 2").rows \
        == [("[1,2,3]",)]


def test_filter_in_where():
    s = mk()
    r = s.sql("select id from j where json_isvalid(js) order by id")
    assert r.rows == [(1,), (2,)]
