"""Client/server protocol tests (mal_mapi + mapilib analogs): DDL/DML/query
round-trips, typed value decoding, error transport, concurrent sessions."""

import datetime
import threading
from decimal import Decimal

import pytest

from monetdb_tpu.server import Client, Server
from monetdb_tpu.storage import Database


@pytest.fixture()
def server():
    srv = Server(Database()).start()
    yield srv
    srv.stop()


def test_roundtrip(server):
    host, port = server.address
    c = Client(host, port)
    assert c.sql("create table t (a int, b decimal(8,2), d date)") is None
    assert c.sql("insert into t values (1, 2.50, date '2020-01-01'), "
                 "(2, 3.25, null)") == 2
    r = c.sql("select a, b, d from t order by a")
    assert r.rows[0] == (1, Decimal("2.50"), datetime.date(2020, 1, 1))
    assert r.rows[1][2] is None
    with pytest.raises(RuntimeError):
        c.sql("select nope from t")
    # connection survives errors
    assert c.sql("select count(*) from t").rows == [(2,)]
    c.close()


def test_concurrent_clients(server):
    host, port = server.address
    boot = Client(host, port)
    boot.sql("create table c (x int)")
    boot.sql("insert into c values (0)")
    boot.close()
    errs = []

    def worker(i):
        try:
            cl = Client(host, port)
            cl.sql(f"insert into c values ({i})")
            r = cl.sql("select count(*) from c")
            assert r.rows[0][0] >= 2
            cl.close()
        except Exception as ex:   # pragma: no cover
            errs.append(ex)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(1, 9)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    check = Client(host, port)
    assert check.sql("select count(*) from c").rows == [(9,)]
    check.close()
