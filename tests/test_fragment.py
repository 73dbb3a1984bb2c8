"""Fragment-compiler parity: every query must produce identical results
through the fused single-dispatch path (exec/fragment.py) and the
op-at-a-time executor (exec/executor.py) — the same oracle discipline the
reference applies between optimizer pipelines (no_mitosis_pipe bisection,
monetdb5/optimizer/opt_pipes.c:110-120)."""

import numpy as np
import pytest

from monetdb_tpu import config
from monetdb_tpu.bench.tpch_gen import gen_tpch
from monetdb_tpu.bench.tpch_load import load_tables
from monetdb_tpu.bench.tpch_queries import QUERIES
from monetdb_tpu.engine import Engine


@pytest.fixture(scope="module")
def tpch_engine():
    cat = load_tables(gen_tpch(0.01))
    return Engine(cat)


def both_ways(engine, sql):
    config.set("fragment_exec", True)
    try:
        a = engine.query(sql)
    finally:
        config.set("fragment_exec", False)
    try:
        b = engine.query(sql)
    finally:
        config.reset("fragment_exec")
    return a, b


def assert_same(a, b, sql=""):
    assert len(a.rows) == len(b.rows), \
        f"row count {len(a.rows)} != {len(b.rows)} for {sql}"
    for ra, rb in zip(a.rows, b.rows):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if va is None or vb is None:
                    assert va is None and vb is None, (va, vb, sql)
                else:
                    assert va == pytest.approx(vb, rel=1e-9), (va, vb, sql)
            else:
                assert va == vb, (va, vb, sql)


FRAGMENT_QUERIES = [
    # scan / filter / project
    "select l_orderkey, l_quantity from lineitem where l_quantity < 5 "
    "order by l_orderkey, l_linenumber limit 20",
    # Q6 shape: scalar aggregate over conjunctive filter
    """select sum(l_extendedprice * l_discount) as revenue from lineitem
       where l_shipdate >= date '1994-01-01'
         and l_shipdate < date '1995-01-01'
         and l_discount between 0.05 and 0.07 and l_quantity < 24""",
    # Q1 shape: dense group-by with arithmetic aggregates
    """select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
              sum(l_extendedprice) as sum_base_price,
              sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
              sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
              avg(l_quantity), avg(l_extendedprice), avg(l_discount),
              count(*) as count_order
       from lineitem where l_shipdate <= date '1998-09-02'
       group by l_returnflag, l_linestatus
       order by l_returnflag, l_linestatus""",
    # sort-path group-by (high-cardinality key)
    "select l_orderkey, count(*), sum(l_quantity) from lineitem "
    "group by l_orderkey order by l_orderkey limit 50",
    # string predicates: LIKE, IN, equality, ranges
    "select count(*) from part where p_type like '%BRASS'",
    "select count(*) from part where p_type not like 'PROMO%'",
    "select count(*) from nation where n_name in ('FRANCE', 'GERMANY')",
    "select count(*) from nation where n_name not in ('FRANCE')",
    "select count(*) from part where p_type > 'MEDIUM' and p_type <= 'STANDARD'",
    # case / coalesce / math
    """select sum(case when p_type like 'PROMO%' then p_retailprice
                       else 0 end), avg(p_retailprice)
       from part""",
    "select min(p_retailprice), max(p_retailprice), count(p_size) from part",
    # distinct + order by desc + nulls
    "select distinct l_returnflag, l_linestatus from lineitem "
    "order by l_returnflag desc, l_linestatus",
    # date extraction group key (dense via min/max propagation)
    """select year(o_orderdate) as yr, count(*), sum(o_totalprice)
       from orders group by year(o_orderdate) order by yr""",
    # limit/offset over plain scan
    "select n_name from nation order by n_name limit 5 offset 3",
    # stddev / variance
    "select l_returnflag, stddev_samp(l_quantity), var_pop(l_discount) "
    "from lineitem group by l_returnflag order by l_returnflag",
    # between / negated between on decimals
    "select count(*) from lineitem where l_discount not between 0.02 and 0.09",
    # string functions via dictionary remap
    "select upper(n_name), length(n_name) from nation order by n_name limit 5",
    "select substring(c_phone, 1, 2) as cc, count(*) from customer "
    "group by substring(c_phone, 1, 2) order by cc limit 8",
    # boolean expression in value context
    "select l_orderkey, l_quantity > 25 from lineitem "
    "order by l_orderkey, l_linenumber limit 10",
    # nullif / division
    "select avg(l_extendedprice / nullif(l_quantity, 0)) from lineitem",
]


@pytest.mark.parametrize("sql", FRAGMENT_QUERIES)
def test_fragment_parity(tpch_engine, sql):
    a, b = both_ways(tpch_engine, sql)
    assert_same(a, b, sql)


@pytest.mark.parametrize("q", [1, 6])
def test_tpch_fragment_parity(tpch_engine, q):
    a, b = both_ways(tpch_engine, QUERIES[q])
    assert_same(a, b, f"tpch q{q}")


def test_fragment_overflow_raises(tpch_engine):
    from monetdb_tpu.ops.calc import CalcError
    config.set("fragment_exec", True)
    try:
        with pytest.raises(CalcError):
            tpch_engine.query(
                "select sum(l_orderkey * 1000000000000000000) from lineitem")
    finally:
        config.reset("fragment_exec")


def test_fragment_divzero_raises(tpch_engine):
    from monetdb_tpu.ops.calc import CalcDivZero
    config.set("fragment_exec", True)
    try:
        with pytest.raises(CalcDivZero):
            tpch_engine.query(
                "select sum(l_orderkey / (l_linenumber - l_linenumber)) "
                "from lineitem")
    finally:
        config.reset("fragment_exec")


def test_all_22_tpch_fused(tpch_engine):
    """Every TPC-H query executes through the fused fragment path — zero
    fallbacks (the reference runs every plan through one executor;
    expanding joins cover non-unique build sides gdk/gdk_join.c:2900,
    sort-dedup covers DISTINCT aggregates, stat propagation keeps
    grouped-key joins packable)."""
    from monetdb_tpu.exec import fragment as frag
    config.set("fragment_exec", True)
    try:
        before = dict(frag.STATS)
        for q in sorted(QUERIES):
            tpch_engine.query(QUERIES[q])
        after = dict(frag.STATS)
        assert after["fallbacks"] == before["fallbacks"], \
            "a TPC-H query silently fell back to the op-at-a-time executor"
        assert after["runs"] - before["runs"] == 22
    finally:
        config.reset("fragment_exec")


def test_expanding_join_parity(tpch_engine):
    """N:M joins (non-unique build side) through the expanding-join path:
    results must match the op-at-a-time executor exactly, including the
    capacity-overflow retry (forced tiny initial capacity)."""
    sql = ("select c_custkey, count(o_orderkey) as cnt from customer "
           "left outer join orders on c_custkey = o_custkey "
           "group by c_custkey order by cnt desc, c_custkey limit 10")
    a, b = both_ways(tpch_engine, sql)
    assert_same(a, b, sql)
    # inner N:M with residual + aggregation over expanded rows
    sql2 = ("select o_orderpriority, count(*) from orders, lineitem "
            "where o_orderkey = l_orderkey and l_quantity > 45 "
            "group by o_orderpriority order by o_orderpriority")
    a, b = both_ways(tpch_engine, sql2)
    assert_same(a, b, sql2)


def test_distinct_aggregate_parity(tpch_engine):
    sql = ("select p_brand, count(distinct ps_suppkey), "
           "sum(distinct ps_supplycost), avg(distinct ps_supplycost) "
           "from partsupp, part where p_partkey = ps_partkey "
           "group by p_brand order by p_brand")
    a, b = both_ways(tpch_engine, sql)
    assert_same(a, b, sql)
