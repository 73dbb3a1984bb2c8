"""Observability tests: TRACE per-operator events with algorithm tags
(mal_profiler + MT_thread_setalgorithm analogs) and the leveled tracer."""

from monetdb_tpu.engine import Engine
from monetdb_tpu.obs import TRC, set_level
from monetdb_tpu.bench.tpch_load import load_tpch
from monetdb_tpu.bench.tpch_queries import QUERIES


def test_trace_events():
    eng = Engine(load_tpch(0.01))
    r = eng.query(QUERIES[3], trace=True)
    assert r.trace, "no profiler events"
    ops = {e["op"] for e in r.trace}
    # OrderBy may fuse into Limit (firstn top-k path)
    assert {"Scan", "Join", "GroupBy", "Limit"} <= ops
    # every event carries timing and row counts
    assert all("usec" in e and "rows" in e for e in r.trace)
    # kernel algorithm tags surface (the MT_thread_setalgorithm analog)
    joins = [e for e in r.trace if e["op"] == "Join"]
    assert any("algorithm" in e for e in joins)
    algos = {e.get("algorithm") for e in r.trace}
    assert algos & {"join:fetch", "join:sortmerge"}


def test_tracer_levels():
    set_level("wal", "debug")
    TRC.debug("wal", "hello")
    assert any(m == "hello" for _t, _l, c, m in TRC.dump() if c == "wal")
    set_level("wal", "error")
    n = len(TRC.dump(10_000))
    TRC.debug("wal", "suppressed")
    assert len(TRC.dump(10_000)) == n
