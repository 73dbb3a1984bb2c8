"""uuid / url / inet atom functions (modules/atoms/{uuid,url,inet}.c) and
query history relations (querylog.c)."""

import re

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_uuid_generate_and_check():
    s = Session(Database())
    s.sql("create table t (a int)")
    s.sql("insert into t values (1), (2)")
    rows = s.sql("select uuid() from t").rows
    assert len(rows) == 2 and rows[0][0] != rows[1][0]
    assert re.match(r"^[0-9a-f-]{36}$", rows[0][0])
    r = s.sql("select isauuid(uuid()), isauuid('nope') from t limit 1")
    assert r.rows == [(True, False)]


def test_url_components():
    s = Session(Database())
    s.sql("create table u (link varchar(100))")
    s.sql("insert into u values "
          "('https://alice@www.example.com:8443/docs/page.html?q=1"
          "#frag')")
    r = s.sql("select getprotocol(link), gethost(link), getdomain(link), "
              "getfile(link), getquery(link), getanchor(link), "
              "getuser(link), getport(link) from u")
    assert r.rows == [("https", "www.example.com", "example.com",
                       "page.html", "q=1", "frag", "alice", "8443")]


def test_inet_containment():
    s = Session(Database())
    s.sql("create table n (addr varchar(20))")
    s.sql("insert into n values ('192.168.1.5'), ('192.168.2.5'), "
          "('10.0.0.1'), ('192.168.1.0/25')")
    r = s.sql("select addr from n where inet_contains(addr, "
              "'192.168.1.0/24') order by addr")
    assert [x[0] for x in r.rows] == ["192.168.1.0/25", "192.168.1.5"]


def test_querylog():
    s = Session(Database())
    s.sql("create table t (a int)")
    s.sql("insert into t values (1)")
    s.sql("select a from t")
    r = s.sql("select query, status from sys.querylog_calls")
    assert any("select a from t" in row[0] and row[1] == "finished"
               for row in r.rows)


def test_str_to_date_and_back():
    """mtime strptime/strftime family (modules/atoms/mtime.c
    str_to_date/date_to_str, C strftime directives)."""
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage.database import Database
    import datetime
    s = Session(Database())
    s.sql("create table t (s varchar(20), d date, ts timestamp)")
    s.sql("insert into t values ('23-09-1987', date '2001-02-03', "
          "timestamp '2003-10-10 11:12:13'), (NULL, NULL, NULL)")
    assert s.sql("select str_to_date(s, '%d-%m-%Y') from t").rows == \
        [(datetime.date(1987, 9, 23),), (None,)]
    assert s.sql("select date_to_str(d, '%Y/%m/%d') from t").rows == \
        [("2001/02/03",), (None,)]
    assert s.sql("select timestamp_to_str(ts, '%H:%M') from t").rows == \
        [("11:12",), (None,)]
    assert s.sql(
        "select str_to_timestamp('2003-10-10 11:12:13', "
        "'%Y-%m-%d %H:%M:%S') from t where s is not null").rows == \
        [(datetime.datetime(2003, 10, 10, 11, 12, 13),)]
