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


def test_columnar_wire_parity_and_speed(tmp_path):
    """Binary columnar result mode (mvc_export_table_columnar,
    sql_result.c:1216): identical values to the JSON path, and bulk
    fetch at least an order of magnitude faster (VERDICT r2 item 9)."""
    import time

    import numpy as np

    from monetdb_tpu.server import Client, ColumnarResult, Server
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database

    db = Database()
    sess = Session(db)
    n = 300_000
    rng = np.random.default_rng(3)
    sess.sql("create table big (k bigint, d decimal(15,2), s varchar(10))")
    ks = rng.integers(0, 1 << 40, n)
    ds = rng.integers(0, 10 ** 6, n)
    csv = tmp_path / "big.csv"
    with open(csv, "w") as f:
        for i in range(n):
            f.write(f"{ks[i]}|{ds[i] / 100:.2f}|v{i % 97}\n")
    assert sess.sql(f"copy into big from '{csv}'") == n

    srv = Server(db).start()
    h, p = srv.address
    try:
        c = Client(h, p)
        t0 = time.perf_counter()
        rj = c.sql("select k, d, s from big")
        t_json = time.perf_counter() - t0
        t0 = time.perf_counter()
        rc = c.sql("select k, d, s from big", columnar=True)
        t_col = time.perf_counter() - t0
        assert isinstance(rc, ColumnarResult) and len(rc) == n
        for i in (0, 1, n // 2, n - 1):
            assert rc.rows[i] == rj.rows[i]
        assert rc.rows == rj.rows
        speed = t_json / t_col
        print(f"columnar fetch speedup: {speed:.1f}x "
              f"(json {t_json*1e3:.0f} ms, columnar {t_col*1e3:.0f} ms)")
        assert speed > 10, f"columnar only {speed:.1f}x faster"
        c.close()
    finally:
        srv.stop()


def test_dbapi_fetchnumpy(tmp_path):
    import numpy as np

    from monetdb_tpu import dbapi
    from monetdb_tpu.server import Server
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database

    db = Database()
    Session(db).sql("create table t (a int, b varchar(5))")
    Session(db).sql("insert into t values (1,'x'), (2,'y'), (3,'x')")
    srv = Server(db).start()
    h, p = srv.address
    try:
        con = dbapi.connect(host=h, port=p, columnar=True)
        cur = con.cursor()
        cur.execute("select a, b from t order by a")
        cols = cur.fetchnumpy()
        assert np.array_equal(cols["a"], np.asarray([1, 2, 3]))
        assert cur.fetchall() == [(1, "x"), (2, "y"), (3, "x")]
        con.close()
    finally:
        srv.stop()
