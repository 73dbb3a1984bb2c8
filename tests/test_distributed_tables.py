"""Distribution DDL: merge (partitioned) tables with pruning, remote
tables with predicate shipping, replica tables, INSERT routing — the
spawn-N-local-servers pattern of the reference's sql/test/remote/Tests/
ssbm.SQL.py condensed to in-process servers."""

import datetime

import pytest

from monetdb_tpu.server import Server
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def _mk_merge(s):
    s.sql("create table p1 (k int, v int)")
    s.sql("create table p2 (k int, v int)")
    s.sql("create table p3 (k int, v int)")
    s.sql("create merge table m (k int, v int) partition by range on (k)")
    s.sql("alter table m add table p1 as partition from 0 to 9")
    s.sql("alter table m add table p2 as partition from 10 to 19")
    s.sql("alter table m add table p3 as partition from 20 to 29")


def test_merge_insert_routing_and_union():
    s = Session(Database())
    _mk_merge(s)
    n = s.sql("insert into m values (1, 100), (11, 200), (21, 300), "
              "(15, 400)")
    assert n == 4
    # rows landed in the right partitions
    assert s.sql("select count(*) from p1").rows == [(1,)]
    assert s.sql("select count(*) from p2").rows == [(2,)]
    assert s.sql("select count(*) from p3").rows == [(1,)]
    # full scan unions all members
    r = s.sql("select k, v from m order by k")
    assert r.rows == [(1, 100), (11, 200), (15, 400), (21, 300)]
    # aggregation over the union
    assert s.sql("select sum(v) from m").rows == [(1000,)]


def test_merge_partition_pruning():
    s = Session(Database())
    _mk_merge(s)
    s.sql("insert into m values (1, 100), (11, 200), (21, 300)")
    plan = "\n".join(r[0] for r in
                     s.sql("explain select v from m where k = 12").rows)
    assert "Scan p2" in plan
    assert "Scan p1" not in plan and "Scan p3" not in plan
    assert s.sql("select v from m where k = 12").rows == []
    assert s.sql("select v from m where k = 11").rows == [(200,)]
    # range predicate prunes to two members
    plan = "\n".join(r[0] for r in s.sql(
        "explain select v from m where k between 5 and 15").rows)
    assert "Scan p1" in plan and "Scan p2" in plan
    assert "Scan p3" not in plan
    r = s.sql("select sum(v) from m where k between 5 and 15")
    assert r.rows == [(200,)]


def test_merge_values_and_null_partition():
    s = Session(Database())
    s.sql("create table ta (r varchar(2), x int)")
    s.sql("create table tb (r varchar(2), x int)")
    s.sql("create table tn (r varchar(2), x int)")
    s.sql("create merge table mv (r varchar(2), x int) "
          "partition by values on (r)")
    s.sql("alter table mv add table ta as partition in ('A', 'B')")
    s.sql("alter table mv add table tb as partition in ('C')")
    s.sql("alter table mv add table tn as partition for null values")
    s.sql("insert into mv values ('A', 1), ('C', 2), (null, 3)")
    assert s.sql("select count(*) from ta").rows == [(1,)]
    assert s.sql("select count(*) from tb").rows == [(1,)]
    assert s.sql("select count(*) from tn").rows == [(1,)]
    plan = "\n".join(r[0] for r in
                     s.sql("explain select x from mv where r = 'C'").rows)
    assert "Scan tb" in plan and "Scan ta" not in plan \
        and "Scan tn" not in plan
    assert s.sql("select x from mv where r = 'C'").rows == [(2,)]
    assert s.sql("select x from mv where r is null").rows == [(3,)]


def test_merge_routing_rejects_out_of_range():
    s = Session(Database())
    _mk_merge(s)
    with pytest.raises(Exception):
        s.sql("insert into m values (99, 1)")


def test_remote_and_merge_of_remote():
    # two worker servers, each holding one partition
    w1 = Server(Database()).start()
    w2 = Server(Database()).start()
    try:
        Session(w1.db).sql("create table sales (d date, amt int)")
        Session(w2.db).sql("create table sales (d date, amt int)")
        Session(w1.db).sql("insert into sales values "
                           "(date '2024-01-05', 10), (date '2024-02-01', 20)")
        Session(w2.db).sql("insert into sales values "
                           "(date '2024-07-01', 30), (date '2024-08-09', 40)")
        sup = Session(Database())
        h1, p1 = w1.address
        h2, p2 = w2.address
        sup.sql(f"create remote table r1 (d date, amt int) "
                f"on '{h1}:{p1}/sales'")
        sup.sql(f"create remote table r2 (d date, amt int) "
                f"on '{h2}:{p2}/sales'")
        # plain remote scan
        assert sup.sql("select sum(amt) from r1").rows == [(30,)]
        # predicate shipping: filter folded into the RemoteScan
        plan = "\n".join(r[0] for r in sup.sql(
            "explain select amt from r1 where amt > 15").rows)
        assert "RemoteScan" in plan and "where" in plan
        assert sup.sql("select amt from r1 where amt > 15").rows == [(20,)]
        # merge over remote partitions with range pruning
        sup.sql("create merge table sales (d date, amt int) "
                "partition by range on (d)")
        sup.sql("alter table sales add table r1 as partition "
                "from date '2024-01-01' to date '2024-06-30'")
        sup.sql("alter table sales add table r2 as partition "
                "from date '2024-07-01' to date '2024-12-31'")
        assert sup.sql("select sum(amt) from sales").rows == [(100,)]
        r = sup.sql("select sum(amt) from sales "
                    "where d >= date '2024-07-01'")
        assert r.rows == [(70,)]
        # pruning: only the H2 partition is contacted
        plan = "\n".join(r[0] for r in sup.sql(
            "explain select amt from sales "
            "where d >= date '2024-08-01'").rows)
        assert f"{h2}:{p2}" in plan and f"{h1}:{p1}" not in plan
        # INSERT routed through merge to the remote member
        sup.sql("insert into sales values (date '2024-03-03', 5)")
        assert Session(w1.db).sql("select count(*) from sales").rows \
            == [(3,)]
        # joins against remote tables
        sup.sql("create table cal (d date, nm varchar(10))")
        sup.sql("insert into cal values (date '2024-01-05', 'jan'), "
                "(date '2024-07-01', 'jul')")
        r = sup.sql("select cal.nm, sales.amt from sales "
                    "join cal on sales.d = cal.d order by cal.nm")
        assert r.rows == [("jan", 10), ("jul", 30)]
    finally:
        w1.stop()
        w2.stop()


def test_replica_prefers_local():
    w = Server(Database()).start()
    try:
        Session(w.db).sql("create table t (a int)")
        Session(w.db).sql("insert into t values (42)")
        s = Session(Database())
        h, p = w.address
        s.sql(f"create remote table t_far (a int) on '{h}:{p}/t'")
        s.sql("create replica table rt (a int)")
        s.sql("alter table rt add table t_far")
        # remote-only replica resolves through the wire
        assert s.sql("select a from rt").rows == [(42,)]
        # add a local copy: planner must now prefer it
        s.sql("create table t_local (a int)")
        s.sql("insert into t_local values (7)")
        s.sql("alter table rt add table t_local")
        assert s.sql("select a from rt").rows == [(7,)]
        plan = "\n".join(r[0] for r in s.sql("explain select a from rt").rows)
        assert "Scan t_local" in plan and "RemoteScan" not in plan
    finally:
        w.stop()


def test_dist_defs_persist(tmp_path):
    db = Database(str(tmp_path / "db"))
    s = Session(db)
    _mk_merge(s)
    s.sql("insert into m values (1, 100), (11, 200)")
    db.checkpoint()
    db.close()
    db2 = Database(str(tmp_path / "db"))
    s2 = Session(db2)
    assert s2.sql("select sum(v) from m").rows == [(300,)]
    assert sorted(m for m, _ in db2.merges["m"].members) \
        == ["p1", "p2", "p3"]
    # WAL-only persistence (no checkpoint after DDL)
    s2.sql("create remote table rr (a int) on 'localhost:1/x'")
    db2.close()
    db3 = Database(str(tmp_path / "db"))
    assert "rr" in db3.remotes
    db3.close()


def test_schema_mismatch_rejected():
    s = Session(Database())
    s.sql("create merge table m2 (k int, v int) partition by range on (k)")
    s.sql("create table bad (k int, v varchar(5))")
    with pytest.raises(Exception):
        s.sql("alter table m2 add table bad as partition from 0 to 9")


def test_two_phase_aggregate_pushdown():
    """Partial GROUP BY runs on the remote servers; only group rows cross
    the wire (mergetable two-phase aggregation over the network)."""
    w1 = Server(Database()).start()
    w2 = Server(Database()).start()
    try:
        for w, vals in ((w1, "(1, 'a', 10), (2, 'b', 20), (3, 'a', 30)"),
                        (w2, "(4, 'a', 40), (5, 'b', 50)")):
            sw = Session(w.db)
            sw.sql("create table f (k int, g varchar(2), v int)")
            sw.sql(f"insert into f values {vals}")
        sup = Session(Database())
        h1, p1 = w1.address
        h2, p2 = w2.address
        sup.sql(f"create remote table f1 (k int, g varchar(2), v int) "
                f"on '{h1}:{p1}/f'")
        sup.sql(f"create remote table f2 (k int, g varchar(2), v int) "
                f"on '{h2}:{p2}/f'")
        sup.sql("create merge table f (k int, g varchar(2), v int)")
        sup.sql("alter table f add table f1")
        sup.sql("alter table f add table f2")
        # plan shows shipped partial aggregates
        plan = "\n".join(r[0] for r in sup.sql(
            "explain select g, sum(v), count(*) from f group by g").rows)
        assert "RemoteQuery" in plan and "group by" in plan
        r = sup.sql("select g, sum(v), count(*), min(v), max(v) from f "
                    "group by g order by g")
        assert r.rows == [("a", 80, 3, 10, 40), ("b", 70, 2, 20, 50)]
        # scalar aggregate (no keys) also combines
        assert sup.sql("select sum(v), count(*) from f").rows \
            == [(150, 5)]
        # with a filter: predicate ships inside the partial query
        r = sup.sql("select g, sum(v) from f where k <> 3 group by g "
                    "order by g")
        assert r.rows == [("a", 50), ("b", 70)]
        # avg is not decomposed (stays correct via full rows)
        r = sup.sql("select g, avg(v) from f group by g order by g")
        assert r.rows[0][0] == "a" and abs(r.rows[0][1] - 80 / 3) < 1e-9
    finally:
        w1.stop()
        w2.stop()
