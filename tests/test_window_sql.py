"""Window functions through the SQL surface, validated against sqlite
(reference coverage: sql/backends/monet5/sql_rank.c + gdk_analytic*)."""

import datetime
from decimal import Decimal

import pytest

from monetdb_tpu.bench.tpch_gen import gen_tpch
from monetdb_tpu.bench.tpch_load import load_tables
from monetdb_tpu.dtypes import Kind
from monetdb_tpu.engine import Engine

from tpch_sqlite_oracle import load_sqlite

_EPOCH = datetime.date(1970, 1, 1)


@pytest.fixture(scope="module")
def data():
    return gen_tpch(0.01)


@pytest.fixture(scope="module")
def engine(data):
    return Engine(load_tables(data))


@pytest.fixture(scope="module")
def con(data):
    return load_sqlite(data)


def _conv(row, types):
    out = []
    for v, t in zip(row, types):
        if v is None:
            out.append(None)
        elif t is not None and t.kind == Kind.DECIMAL:
            out.append(Decimal(int(v)).scaleb(-t.scale))
        elif t is not None and t.kind == Kind.DATE:
            out.append(_EPOCH + datetime.timedelta(days=int(v)))
        elif t is not None and t.np_dtype.kind == "f":
            out.append(float(v))
        else:
            out.append(v)
    return tuple(out)


def _check(engine, con, sql, oracle_sql=None):
    res = engine.query(sql)
    want = [_conv(r, res.types)
            for r in con.execute(oracle_sql or sql).fetchall()]
    assert len(res.rows) == len(want)
    for i, (g, w) in enumerate(zip(res.rows, want)):
        for x, y in zip(g, w):
            if isinstance(x, float) or isinstance(y, float):
                assert x is not None and y is not None, (i, g, w)
                assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (i, g, w)
            else:
                assert x == y, (i, g, w)


CASES = {
    "row_number": """
        select s_suppkey, s_nationkey,
               row_number() over (partition by s_nationkey
                                  order by s_suppkey) as rn
        from supplier order by s_nationkey, s_suppkey limit 200""",
    "rank_dense": """
        select c_custkey, c_nationkey,
               rank() over (partition by c_nationkey
                            order by c_acctbal desc) as r,
               dense_rank() over (partition by c_nationkey
                                  order by c_acctbal desc) as dr
        from customer order by c_nationkey, c_custkey limit 300""",
    "sum_full": """
        select ps_partkey, ps_suppkey,
               sum(ps_availqty) over (partition by ps_partkey) as tot
        from partsupp order by ps_partkey, ps_suppkey limit 300""",
    "sum_running": """
        select ps_partkey, ps_suppkey,
               sum(ps_availqty) over (partition by ps_partkey
                                      order by ps_suppkey) as run
        from partsupp order by ps_partkey, ps_suppkey limit 300""",
    "avg_minmax_count": ("""
        select ps_partkey, ps_suppkey,
               avg(ps_supplycost) over (partition by ps_partkey) as a,
               min(ps_supplycost) over (partition by ps_partkey) as lo,
               max(ps_supplycost) over (partition by ps_partkey) as hi,
               count(*) over (partition by ps_partkey) as n
        from partsupp order by ps_partkey, ps_suppkey limit 300""", """
        select ps_partkey, ps_suppkey,
               (sum(ps_supplycost) over (partition by ps_partkey)/100.0)
                 / (count(*) over (partition by ps_partkey)) as a,
               min(ps_supplycost) over (partition by ps_partkey) as lo,
               max(ps_supplycost) over (partition by ps_partkey) as hi,
               count(*) over (partition by ps_partkey) as n
        from partsupp order by ps_partkey, ps_suppkey limit 300"""),
    "lag_lead": """
        select s_suppkey,
               lag(s_acctbal) over (order by s_suppkey) as prev,
               lead(s_acctbal) over (order by s_suppkey) as nxt
        from supplier order by s_suppkey limit 200""",
    "ntile_first": """
        select s_suppkey,
               ntile(4) over (order by s_suppkey) as q,
               first_value(s_name) over (partition by s_nationkey
                                         order by s_suppkey) as fv
        from supplier order by s_suppkey limit 200""",
    "pct_cume": """
        select c_custkey,
               percent_rank() over (partition by c_nationkey
                                    order by c_acctbal) as pr,
               cume_dist() over (partition by c_nationkey
                                 order by c_acctbal) as cd
        from customer order by c_custkey limit 300""",
    "rows_frame_sum": """
        select ps_partkey, ps_suppkey,
               sum(ps_availqty) over (partition by ps_partkey
                                      order by ps_suppkey
                                      rows between unbounded preceding
                                      and current row) as run
        from partsupp order by ps_partkey, ps_suppkey limit 300""",
    "decimal_running_sum": """
        select ps_partkey, ps_suppkey,
               sum(ps_supplycost) over (partition by ps_partkey
                                        order by ps_suppkey) as run
        from partsupp order by ps_partkey, ps_suppkey limit 300""",
}


@pytest.mark.parametrize("name", list(CASES))
def test_window(name, engine, con):
    case = CASES[name]
    if isinstance(case, tuple):
        _check(engine, con, case[0], case[1])
    else:
        _check(engine, con, case)


def test_nth_value():
    s = _mk_session() if "_mk_session" in dir() else None
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database
    s = Session(Database())
    s.sql("create table w (g int, x int)")
    s.sql("insert into w values (1, 10), (1, 20), (1, 30), (2, 5), (2, 7)")
    r = s.sql("select g, x, nth_value(x, 2) over "
              "(partition by g order by x) from w order by g, x")
    assert r.rows == [(1, 10, None), (1, 20, 20), (1, 30, 20),
                      (2, 5, None), (2, 7, 7)]
