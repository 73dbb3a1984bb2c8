"""BATsort / BATfirstn / join-family parity vs numpy oracles."""

import numpy as np
import pytest

from monetdb_tpu import Column, I32, I64, F64
from monetdb_tpu.column import Cand
from monetdb_tpu.ops import sort as SRT
from monetdb_tpu.ops import join as J

NIL32 = np.iinfo(np.int32).min


def col_i32(vals, **p):
    return Column.from_numpy(np.array(vals, np.int32), I32, **p)


def order_list(oids, n):
    return np.asarray(oids[:n]).tolist()


def test_argsort_basic():
    c = col_i32([5, 1, 4, 2, 3])
    oids, n = SRT.argsort([c])
    assert order_list(oids, n) == [1, 3, 4, 2, 0]


def test_argsort_desc_and_stable():
    c1 = col_i32([1, 2, 1, 2])
    c2 = col_i32([9, 8, 7, 6])
    oids, n = SRT.argsort([c1, c2], descending=[False, True])
    # key1 asc, key2 desc: (1,9)(1,7) then (2,8)(2,6)
    assert order_list(oids, n) == [0, 2, 1, 3]


def test_sort_nils_first_asc_last_desc():
    c = col_i32([3, NIL32, 1])
    oids, n = SRT.argsort([c])
    assert order_list(oids, n) == [1, 2, 0]      # nil smallest (GDK order)
    oids, n = SRT.argsort([c], descending=[True])
    assert order_list(oids, n) == [0, 2, 1]


def test_sort_nils_last_override():
    c = col_i32([3, NIL32, 1])
    oids, n = SRT.argsort([c], nils_last=[True])
    assert order_list(oids, n) == [2, 0, 1]


def test_sort_floats():
    c = Column.from_numpy(np.array([2.5, -1.0, np.nan, 0.0, -3.5]), F64)
    oids, n = SRT.argsort([c])
    assert order_list(oids, n) == [2, 4, 1, 3, 0]


def test_firstn():
    c = col_i32([5, 1, 4, 2, 3])
    oids, n = SRT.firstn([c], 3)
    assert order_list(oids, n) == [1, 3, 4]


def test_inner_join():
    l = col_i32([1, 2, 3, 2])
    r = col_i32([2, 4, 2, 1])
    r1, r2, n = J.join(l, r)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(0, 3), (1, 0), (1, 2), (3, 0), (3, 2)]


def test_join_nil_no_match():
    l = col_i32([1, NIL32, 2])
    r = col_i32([NIL32, 1])
    r1, r2, n = J.join(l, r)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(0, 1)]
    r1, r2, n = J.join(l, r, nil_matches=True)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(0, 1), (1, 0)]


def test_outer_join():
    l = col_i32([1, 5, 2])
    r = col_i32([2, 1])
    r1, r2, n = J.outerjoin(l, r)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(0, 1), (1, -1), (2, 0)]


def test_semijoin_antijoin():
    l = col_i32([1, 5, 2, 7])
    r = col_i32([2, 1, 2])
    oids, n = J.semijoin(l, r)
    assert order_list(oids, n) == [0, 2]
    oids, n = J.antijoin(l, r)
    assert order_list(oids, n) == [1, 3]


def test_markjoin_not_in_semantics():
    NIL8 = np.iinfo(np.int8).min
    l = col_i32([1, 9, NIL32])
    r_with_nil = col_i32([1, NIL32])
    oids, mark, n = J.markjoin(l, r_with_nil)
    m = np.asarray(mark[:n]).tolist()
    assert m == [1, NIL8, NIL8]  # matched / miss-but-right-has-nil / nil left
    r_clean = col_i32([1, 3], nonil=True)
    oids, mark, n = J.markjoin(l, r_clean)
    m = np.asarray(mark[:n]).tolist()
    assert m == [1, 0, NIL8]


def test_fetchjoin_dense_pk():
    # right is a dense sorted unique PK 1..5: fetch path
    r = col_i32([1, 2, 3, 4, 5], sorted=True, key=True, nonil=True)
    r.minval, r.maxval = 1, 5
    l = col_i32([3, 1, 9, 5])
    r1, r2, n = J.join(l, r)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(0, 2), (1, 0), (3, 4)]


def test_join_with_candidates():
    l = col_i32([1, 2, 3])
    r = col_i32([1, 2, 3])
    from monetdb_tpu.ops import select as S
    lc = S.thetaselect(l, None, 1, ">")
    r1, r2, n = J.join(l, r, lcand=lc)
    pairs = sorted(zip(order_list(r1, n), order_list(r2, n)))
    assert pairs == [(1, 1), (2, 2)]
