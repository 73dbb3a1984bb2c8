"""End-to-end TPC-H queries hand-built from GDK-level ops, validated against
the numpy oracle (the .ans-file role) at SF 0.01."""

import numpy as np
import pytest

from monetdb_tpu import Column
from monetdb_tpu.bench.tpch_gen import gen_tpch
from monetdb_tpu.bench.tpch_load import load_tables
from monetdb_tpu.dtypes import decimal
from monetdb_tpu.ops import aggr as A
from monetdb_tpu.ops import calc as C
from monetdb_tpu.ops import group as G
from monetdb_tpu.ops import project as P
from monetdb_tpu.ops import select as S
from monetdb_tpu.ops import sort as SRT

from tpch_oracle import q1 as oracle_q1, q6 as oracle_q6, _days


@pytest.fixture(scope="module")
def data():
    return gen_tpch(0.01)


@pytest.fixture(scope="module")
def cat(data):
    return load_tables(data)


def test_q1(data, cat):
    li = cat.get("lineitem")
    cutoff = _days("1998-12-01") - 90
    cand = S.thetaselect(li.col("l_shipdate"), None, cutoff, "<=")

    extp = li.col("l_extendedprice")
    disc = li.col("l_discount")
    tax = li.col("l_tax")
    one_minus = C.binop("sub", disc, 100, out_typ=decimal(15, 2))
    one_minus = C.unop("neg", one_minus)           # 100 - disc
    disc_price = C.binop("mul", extp, one_minus, out_typ=decimal(18, 4))
    one_plus = C.binop("add", tax, 100, out_typ=decimal(15, 2))
    charge = C.binop("mul", disc_price, one_plus, out_typ=decimal(18, 6))

    g = G.group_multi([li.col("l_returnflag"), li.col("l_linestatus")],
                      cand)
    sum_qty = A.group_sum(li.col("l_quantity"), g)
    sum_base = A.group_sum(extp, g)
    sum_disc = A.group_sum(disc_price, g)
    sum_charge = A.group_sum(charge, g)
    avg_qty, _, _ = A.group_avg(li.col("l_quantity"), g)
    avg_price, _, _ = A.group_avg(extp, g)
    avg_disc, _, _ = A.group_avg(disc, g)
    cnt = A.group_count(None, g)

    # group key columns via extents projection
    ext = (g.extents, g.ngroups)
    rf = P.project_oids(*ext, li.col("l_returnflag"))
    ls = P.project_oids(*ext, li.col("l_linestatus"))
    order, n = SRT.argsort([rf, ls])
    got = []
    rf_s = P.project_oids(order, n, rf).to_numpy()
    ls_s = P.project_oids(order, n, ls).to_numpy()
    cols = [sum_qty, sum_base, sum_disc, sum_charge,
            avg_qty, avg_price, avg_disc, cnt]
    cols_s = [P.project_oids(order, n, c).to_numpy() for c in cols]
    for i in range(n):
        got.append((rf_s[i], ls_s[i], int(cols_s[0][i]), int(cols_s[1][i]),
                    int(cols_s[2][i]), int(cols_s[3][i]), float(cols_s[4][i]),
                    float(cols_s[5][i]), float(cols_s[6][i]),
                    int(cols_s[7][i])))

    want = oracle_q1(data)
    assert len(got) == len(want)
    for grow, wrow in zip(got, want):
        assert grow[:6] == wrow[:6], (grow, wrow)
        for gv, wv in zip(grow[6:9], wrow[6:9]):
            assert abs(gv - wv) < 1e-9 * max(1.0, abs(wv))
        assert grow[9] == wrow[9]


def test_q6(data, cat):
    li = cat.get("lineitem")
    sd = li.col("l_shipdate")
    cand = S.select(sd, None, tl=_days("1994-01-01"),
                    th=_days("1995-01-01"), li=True, hi=False)
    cand = S.cand_and(
        cand, S.select(li.col("l_discount"), None, tl=5, th=7), li.cap)
    cand = S.cand_and(
        cand, S.thetaselect(li.col("l_quantity"), None, 2400, "<"), li.cap)
    rev = C.binop("mul", li.col("l_extendedprice"), li.col("l_discount"),
                  out_typ=decimal(18, 4))
    total = A.scalar_sum(rev, cand)
    want = oracle_q6(data)
    assert int(total.data[0]) == want[0][0]
