"""Server auth (challenge-response) and the DB-API 2.0 interface."""

import pytest

from monetdb_tpu import dbapi
from monetdb_tpu.server import Client, Server
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_auth_required():
    db = Database()
    db.create_user("alice", "secret")
    db.grant(["select", "insert"], "t", "alice")
    Session(db).sql("create table t (a int)")
    Session(db).sql("insert into t values (1)")
    srv = Server(db).start()
    try:
        h, p = srv.address
        c = Client(h, p, "alice", "secret")
        assert c.sql("select a from t").rows == [(1,)]
        c.close()
        with pytest.raises(Exception):
            Client(h, p, "alice", "wrong")
        with pytest.raises(Exception):
            Client(h, p, "bob", "secret")
    finally:
        srv.stop()


def test_auth_persists(tmp_path):
    db = Database(str(tmp_path / "db"))
    db.create_user("u", "pw")
    db.checkpoint()
    db.close()
    db2 = Database(str(tmp_path / "db"))
    assert "u" in db2.users
    db2.close()


def test_dbapi_embedded():
    with dbapi.connect() as conn:
        cur = conn.cursor()
        cur.execute("create table t (a int, b varchar(5))")
        cur.execute("insert into t values (1, 'x'), (2, 'y')")
        assert cur.rowcount == 2
        cur.execute("select a, b from t where a > ? order by a", (0,))
        assert cur.description[0][0] == "a"
        assert cur.fetchone() == (1, "x")
        assert cur.fetchall() == [(2, "y")]
        cur.execute("select a from t where b = ?", ("y",))
        assert cur.fetchall() == [(2,)]
        cur.executemany("insert into t values (?, ?)",
                        [(3, "z"), (4, "w")])
        cur.execute("select count(*) from t")
        assert cur.fetchone() == (4,)


def test_dbapi_network():
    db = Database()
    db.create_user("alice", "secret")
    db.grant(["select", "insert"], "t", "alice")
    srv = Server(db).start()
    try:
        h, p = srv.address
        conn = dbapi.connect(host=h, port=p, user="alice",
                             password="secret")
        cur = conn.cursor()
        cur.execute("create table t (a int)")
        cur.execute("insert into t values (7)")
        cur.execute("select a from t")
        assert cur.fetchall() == [(7,)]
        with pytest.raises(dbapi.DatabaseError):
            cur.execute("select nope from t")
        conn.close()
    finally:
        srv.stop()


def test_tls_server_client(tmp_path):
    """TLS-wrapped connections (the reference's OpenSSL stream layer;
    testing/tlstester.py surface): handshake, query, and a plaintext
    client failing against a TLS port."""
    import subprocess
    from monetdb_tpu.server import Client, Server
    from monetdb_tpu.storage import Database
    cert, key = str(tmp_path / "c.pem"), str(tmp_path / "k.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj",
         "/CN=127.0.0.1"], check=True, capture_output=True)
    db = Database()
    srv = Server(db, tls=(cert, key)).start()
    host, port = srv.address
    c = Client(host, port, tls=True, tls_verify=False)
    c.sql("create table t (x int)")
    c.sql("insert into t values (41), (1)")
    assert c.sql("select sum(x) from t").rows == [(42,)]
    import pytest as _pt
    with _pt.raises(Exception):
        plain = Client(host, port)          # plaintext against TLS port
        plain.sql("select 1")
    srv.stop()
