"""Dataflow scheduler + admission control (mal_dataflow.c DFLOWworker
pool, mal_resource.c MALadmission_claim analogs)."""

import threading
import time

import pytest

from monetdb_tpu import config
from monetdb_tpu.exec import dataflow
from monetdb_tpu.exec.dataflow import Admission, run_parallel
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def test_run_parallel_order_and_results():
    out = run_parallel([lambda: 1, lambda: 2, lambda: 3], [10, 10, 10])
    assert out == [1, 2, 3]


def test_run_parallel_propagates_errors():
    def boom():
        raise ValueError("x")
    with pytest.raises(ValueError):
        run_parallel([lambda: 1, boom], [1, 1])


def test_admission_blocks_until_release():
    adm = Admission(100)
    g1 = adm.claim(80)
    order = []

    def second():
        g = adm.claim(50)          # must wait for the first release
        order.append("second")
        adm.release(g)

    t = threading.Thread(target=second)
    t.start()
    time.sleep(0.1)
    assert order == []             # still blocked
    order.append("release")
    adm.release(g1)
    t.join(timeout=5)
    assert order == ["release", "second"]


def test_admission_always_admits_when_idle():
    adm = Admission(100)
    g = adm.claim(10_000)          # oversized claim admitted when idle
    assert g == 100                # capped at the pool (mal_resource.c)
    adm.release(g)
    assert adm.free == 100


def test_parallel_join_matches_sequential():
    s = Session(Database())
    s.sql("create table a (k int, v int)")
    s.sql("create table b (k int, w int)")
    s.sql("insert into a values (1,10),(2,20),(3,30)")
    s.sql("insert into b values (2,200),(3,300),(4,400)")
    q = ("select a.k, v, w from a join b on a.k = b.k order by a.k")
    config.set("dataflow_workers", 4)
    try:
        par = s.sql(q).rows
        config.set("dataflow_workers", 1)
        s2 = Session(Database())
        s2.sql("create table a (k int, v int)")
        s2.sql("create table b (k int, w int)")
        s2.sql("insert into a values (1,10),(2,20),(3,30)")
        s2.sql("insert into b values (2,200),(3,300),(4,400)")
        seq = s2.sql(q).rows
    finally:
        config.reset("dataflow_workers")
    assert par == seq == [(2, 20, 200), (3, 30, 300)]


def test_stats_exposed():
    st = dataflow.stats()
    assert "parallel_runs" in st and "pool_bytes" in st
