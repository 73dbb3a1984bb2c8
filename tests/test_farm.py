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
