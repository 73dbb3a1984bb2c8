"""Observability tests: TRACE per-operator events with algorithm tags
(mal_profiler + MT_thread_setalgorithm analogs) and the leveled tracer."""

from monetdb_tpu.engine import Engine
from monetdb_tpu.obs import TRC, set_level
from monetdb_tpu.bench.tpch_load import load_tpch
from monetdb_tpu.bench.tpch_queries import QUERIES


def test_trace_events_fragment():
    """TRACE measures the path that actually runs (the reference's
    SQLsetTrace reports the executed plan, sql_execute.c:61): a fused
    query emits per-fragment events - lower time, compile hit/miss, RPC
    count - tagged with the fragment:jit algorithm."""
    eng = Engine(load_tpch(0.01))
    r = eng.query(QUERIES[3], trace=True)
    assert r.trace, "no profiler events"
    ops = {e["op"] for e in r.trace}
    assert "fragment.run" in ops
    runs = [e for e in r.trace if e["op"] == "fragment.run"]
    assert runs[0]["algorithm"] == "fragment:jit"
    assert runs[0]["rpcs"] >= 1 and "rows" in runs[0] and "usec" in runs[0]
    assert runs[0]["compile"] in ("hit", "miss")
    # the plan cache makes the second run a compile hit with 1-2 RPCs
    r2 = eng.query(QUERIES[3], trace=True)
    runs2 = [e for e in r2.trace if e["op"] == "fragment.run"]
    assert runs2[0]["compile"] == "hit"
    assert runs2[0]["rpcs"] <= 2


def test_trace_events_operator_path():
    """With fragments disabled, TRACE reports per-operator events with
    kernel algorithm tags (mal_profiler + MT_thread_setalgorithm)."""
    from monetdb_tpu import config
    config.set("fragment_exec", False)
    try:
        eng = Engine(load_tpch(0.01))
        r = eng.query(QUERIES[3], trace=True)
        assert r.trace, "no profiler events"
        ops = {e["op"] for e in r.trace}
        # OrderBy may fuse into Limit (firstn top-k path)
        assert {"Scan", "Join", "GroupBy", "Limit"} <= ops
        # every event carries timing and row counts
        assert all("usec" in e and "rows" in e for e in r.trace)
        # kernel algorithm tags surface (MT_thread_setalgorithm analog)
        joins = [e for e in r.trace if e["op"] == "Join"]
        assert any("algorithm" in e for e in joins)
        algos = {e.get("algorithm") for e in r.trace}
        assert algos & {"join:fetch", "join:sortmerge"}
    finally:
        config.reset("fragment_exec")


def test_tracer_levels():
    set_level("wal", "debug")
    TRC.debug("wal", "hello")
    assert any(m == "hello" for _t, _l, c, m in TRC.dump() if c == "wal")
    set_level("wal", "error")
    n = len(TRC.dump(10_000))
    TRC.debug("wal", "suppressed")
    assert len(TRC.dump(10_000)) == n
