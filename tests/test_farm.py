"""Farm daemon (monetdbd analog): db lifecycle, status, snapshot/restore,
multiplex-funnel."""

from monetdb_tpu.farm import Farm
from monetdb_tpu.server import Client


def test_farm_lifecycle_and_funnel(tmp_path):
    farm = Farm(str(tmp_path / "farm"))
    farm.create("db1")
    farm.create("db2")
    assert farm.databases() == ["db1", "db2"]
    st = {e["name"]: e["state"] for e in farm.status()}
    assert st == {"db1": "stopped", "db2": "stopped"}

    h1, p1 = farm.start("db1")
    h2, p2 = farm.start("db2")
    for h, p in ((h1, p1), (h2, p2)):
        c = Client(h, p)
        c.sql("create table t (a int)")
        c.close()
    Client(h1, p1).sql("insert into t values (1), (2)")
    Client(h2, p2).sql("insert into t values (10)")

    # funnel: scatter one query, merge results (multiplex-funnel.c)
    f = farm.funnel(["db1", "db2"])
    rows = sorted(f.sql("select a from t").rows)
    assert rows == [(1,), (2,), (10,)]
    assert f.sql("insert into t values (99)") == 2   # broadcast DML
    f.close()

    # snapshot a running db, restore into a new name
    tar = str(tmp_path / "db1.tar")
    farm.snapshot("db1", tar)
    farm.stop_all()
    st = {e["name"]: e["state"] for e in farm.status()}
    assert set(st.values()) == {"stopped"}
    farm.restore("db3", tar)
    h3, p3 = farm.start("db3")
    c = Client(h3, p3)
    assert sorted(c.sql("select a from t").rows) == [(1,), (2,), (99,)]
    c.close()
    farm.stop_all()


def test_supervisor_restarts_crashed_server(tmp_path):
    """forkmserver.c:189 analog: the babysitter restarts a dead server on
    the same port (Database reopen = WAL-replay recovery) and gives up on
    a flapping one after the restart budget."""
    import time

    farm = Farm(str(tmp_path / "farm"))
    farm.create("db")
    h, p = farm.start("db")
    c = Client(h, p)
    c.sql("create table t (a int)")
    c.sql("insert into t values (7)")
    c.close()

    def crash(name):
        # simulate a crash: make the accept loop die with an exception
        import socket as _s
        srv = farm._servers[name]
        def boom(*a, **k):
            raise RuntimeError("simulated crash")
        srv._srv._handle_request_noblock = boom
        try:
            _s.create_connection((h, p), timeout=2).close()
        except Exception:
            pass
        srv._thread.join(timeout=5)
        assert not srv.alive

    crash("db")
    restarted = farm.check_once()
    assert restarted == ["db"]
    st = {e["name"]: e for e in farm.status()}
    assert st["db"]["state"] == "running"
    assert st["db"]["port"] == p                 # same address
    assert st["db"]["restarts"] == 1

    c = Client(h, p)                             # data survived recovery
    assert c.sql("select a from t").rows == [(7,)]
    c.close()

    # crash-loop budget: repeated crashes within the window -> give up
    for _ in range(5):
        if "db" not in farm._servers:
            break
        crash("db")
        farm.check_once(max_restarts=3, window=60.0)
    st = {e["name"]: e for e in farm.status()}
    assert st["db"]["state"] == "crashed"

    # background babysitter thread start/stop is clean
    farm.supervise(interval=0.05)
    time.sleep(0.15)
    farm.stop_all()


def test_proxy_routes_by_database_name(tmp_path):
    """merovingian proxy.c analog: one farm port reaches every database
    by name; a stopped local db starts on demand (forkmserver.c)."""
    from monetdb_tpu.farm import Farm
    from monetdb_tpu.server import Client
    farm = Farm(str(tmp_path / "farm"))
    try:
        farm.create("alpha")
        farm.create("beta")
        farm.start("alpha")          # beta stays stopped: on-demand start
        host, port = farm.proxy_listen()
        c1 = Client(host, port, database="alpha")
        c1.sql("create table t (x int)")
        c1.sql("insert into t values (7)")
        assert c1.sql("select x from t").rows == [(7,)]
        c2 = Client(host, port, database="beta")   # auto-started
        c2.sql("create table u (y int)")
        assert c2.sql("select count(*) from u").rows == [(0,)]
        assert "beta" in farm._servers
        c3 = Client(host, port, database="nosuch")
        import pytest as _pt
        with _pt.raises(Exception, match="no such database"):
            c3.sql("select 1")
    finally:
        farm.stop_all()


def test_discovery_and_cross_farm_proxy(tmp_path):
    """discoveryrunner.c analog: two farms on one host announce their
    databases over UDP; a client on farm A's proxy reaches a database
    hosted by farm B through the discovered address."""
    import time
    from monetdb_tpu.farm import Farm
    from monetdb_tpu.server import Client
    a = Farm(str(tmp_path / "a"))
    b = Farm(str(tmp_path / "b"))
    port = 51234
    try:
        b.create("remote_db")
        b.start("remote_db")
        a.enable_discovery(port=port, interval=0.1)
        b.enable_discovery(port=port, interval=0.1)
        for _ in range(60):
            if "remote_db" in a.neighbors:
                break
            time.sleep(0.1)
        assert "remote_db" in a.neighbors
        assert any(e["name"] == "remote_db" and e["state"] == "remote"
                   for e in a.status())
        host, pport = a.proxy_listen()
        c = Client(host, pport, database="remote_db")
        c.sql("create table r (x int)")
        c.sql("insert into r values (42)")
        assert c.sql("select x from r").rows == [(42,)]
    finally:
        a.stop_all()
        b.stop_all()
