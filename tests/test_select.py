"""BATselect truth-table parity tests (reference gdk/gdk_select.c:1280-1340)
against a numpy oracle."""

import numpy as np
import pytest

from monetdb_tpu import Column, I32, F64
from monetdb_tpu.ops import select as S

NIL = np.iinfo(np.int32).min


def mk(vals, nonil=None):
    a = np.array(vals, dtype=np.int32)
    return Column.from_numpy(a, I32)


def oids(cand, col):
    c = S.materialize(cand, col.cap)
    out = np.asarray(c.oids[: c.oid_count])
    return sorted(out.tolist())


DATA = [5, NIL, 3, 7, 5, 1, NIL, 9, 5, 2]


@pytest.fixture(scope="module")
def col():
    return mk(DATA)


def np_oracle(tl, th, li, hi, anti, nil_matches=False):
    x = np.array(DATA, dtype=np.int64)
    isnil = x == NIL
    tl_nil = tl is None or tl == NIL
    th_null = th == "NULL"
    th_nil = (not th_null) and (th is None or th == NIL)

    if tl_nil and th_null:
        if nil_matches:
            m = ~isnil if anti else (isnil if li else np.zeros_like(isnil))
        elif anti:
            m = ~isnil
        else:
            m = isnil if li else np.zeros_like(isnil)
        return np.nonzero(m)[0].tolist()
    if tl_nil and th_nil:
        m = np.zeros_like(isnil) if anti else ~isnil
        return np.nonzero(m)[0].tolist()
    if tl_nil:
        m = (x <= th) if hi else (x < th)
        m &= ~isnil
        if anti:
            m = ~m & ~isnil
        return np.nonzero(m)[0].tolist()
    if th_null:
        if not li:
            m = ~isnil if anti else np.zeros_like(isnil)
        elif anti:
            m = (x != tl) & ~isnil
        else:
            m = (x == tl) & ~isnil
        return np.nonzero(m)[0].tolist()
    if th_nil:
        m = (x >= tl) if li else (x > tl)
        m &= ~isnil
        if anti:
            m = ~m & ~isnil
        return np.nonzero(m)[0].tolist()
    if tl == th:
        if li and hi:
            m = ((x != tl) & ~isnil) if anti else ((x == tl) & ~isnil)
        else:
            m = ~isnil if anti else np.zeros_like(isnil)
        return np.nonzero(m)[0].tolist()
    if tl > th:
        m = ~isnil if anti else np.zeros_like(isnil)
        return np.nonzero(m)[0].tolist()
    lo = (x >= tl) if li else (x > tl)
    up = (x <= th) if hi else (x < th)
    m = lo & up & ~isnil
    if anti:
        m = ~m & ~isnil
    return np.nonzero(m)[0].tolist()


CASES = []
for li in (True, False):
    for hi in (True, False):
        for anti in (True, False):
            CASES += [
                (NIL, "NULL", li, hi, anti),
                (NIL, NIL, li, hi, anti),
                (NIL, 5, li, hi, anti),
                (3, "NULL", li, hi, anti),
                (3, NIL, li, hi, anti),
                (5, 5, li, hi, anti),
                (2, 7, li, hi, anti),
                (7, 2, li, hi, anti),
            ]


@pytest.mark.parametrize("tl,th,li,hi,anti", CASES)
def test_truth_table(col, tl, th, li, hi, anti):
    th_arg = None if th == "NULL" else th
    got = oids(S.select(col, tl=tl, th=th_arg, li=li, hi=hi, anti=anti), col)
    want = np_oracle(tl, th, li, hi, anti)
    assert got == want, (tl, th, li, hi, anti)


def test_nil_matches_point():
    col = mk(DATA)
    got = oids(S.select(col, tl=NIL, th=None, nil_matches=True), col)
    assert got == [1, 6]
    got = oids(S.select(col, tl=NIL, th=None, anti=True, nil_matches=True), col)
    assert got == [0, 2, 3, 4, 5, 7, 8, 9]


def test_theta():
    col = mk(DATA)
    assert oids(S.thetaselect(col, None, 5, "<"), col) == [2, 5, 9]
    assert oids(S.thetaselect(col, None, 5, "<="), col) == [0, 2, 4, 5, 8, 9]
    assert oids(S.thetaselect(col, None, 5, ">"), col) == [3, 7]
    assert oids(S.thetaselect(col, None, 5, "=="), col) == [0, 4, 8]
    assert oids(S.thetaselect(col, None, 5, "!="), col) == [2, 3, 5, 7, 9]


def test_with_candidate():
    col = mk(DATA)
    c1 = S.thetaselect(col, None, 5, "<=")       # [0,2,4,5,8,9]
    c2 = S.thetaselect(col, c1, 3, ">=")          # values in [3,5]
    assert oids(c2, col) == [0, 2, 4, 8]


def test_cand_algebra():
    col = mk(DATA)
    a = S.thetaselect(col, None, 5, "==")
    b = S.thetaselect(col, None, 3, "==")
    assert oids(S.cand_or(a, b, col.cap), col) == [0, 2, 4, 8]
    assert oids(S.cand_and(a, b, col.cap), col) == []
    # complement includes nil rows (candidate algebra is row-set algebra)
    assert oids(S.cand_not(a, col.cap), col) == [1, 2, 3, 5, 6, 7, 9]


def test_float_nils():
    a = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    col = Column.from_numpy(a, F64)
    assert oids(S.thetaselect(col, None, 2.0, ">"), col) == [2, 4]
    assert oids(S.thetaselect(col, None, 3.0, "!="), col) == [0, 4]
    got = oids(S.select(col, tl=None, th=None, li=True), col)
    assert got == [1, 3]


def test_dense_and_materialize():
    col = mk(DATA)
    from monetdb_tpu.column import Cand
    d = Cand.dense(col.count, 2, 6)
    assert oids(d, col) == [2, 3, 4, 5]
    m = S.materialize(d, col.cap)
    assert m.oid_count == 4
