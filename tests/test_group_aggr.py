"""BATgroup / BATgroup* aggregate parity vs numpy oracles."""

import numpy as np
import pytest

from monetdb_tpu import Column, I32, I64, F64
from monetdb_tpu.column import Cand
from monetdb_tpu.ops import group as G
from monetdb_tpu.ops import aggr as A
from monetdb_tpu.ops import select as S

NIL32 = np.iinfo(np.int32).min
NIL64 = np.iinfo(np.int64).min


def groups_of(g, n):
    return np.asarray(g.ids[:n]).tolist()


def test_group_single_sortpath():
    vals = np.array([7, 3, 7, 1, 3, 7], np.int32)
    col = Column.from_numpy(vals, I32)
    g = G.group(col)
    ids = groups_of(g, 6)
    assert g.ngroups == 3
    # same value ⇒ same id, different ⇒ different
    assert ids[0] == ids[2] == ids[5]
    assert ids[1] == ids[4]
    assert len({ids[0], ids[1], ids[3]}) == 3
    hist = np.asarray(g.histo[:3])
    assert sorted(hist.tolist()) == [1, 2, 3]


def test_group_dense_strings():
    col = Column.from_strings(["a", "b", "a", "c", "b", "a"])
    g = G.group(col)
    assert g.ngroups == 3
    ids = groups_of(g, 6)
    assert ids[0] == ids[2] == ids[5]
    assert ids[1] == ids[4]
    hist = np.asarray(g.histo[:3]).tolist()
    assert sorted(hist) == [1, 2, 3]


def test_group_refinement():
    c1 = Column.from_strings(["x", "x", "y", "y", "x", "x"])
    c2 = Column.from_strings(["a", "b", "a", "a", "a", "b"])
    g = G.group_multi([c1, c2])
    assert g.ngroups == 3  # xa, xb, ya
    ids = groups_of(g, 6)
    assert ids[0] == ids[4] and ids[1] == ids[5] and ids[2] == ids[3]
    assert len({ids[0], ids[1], ids[2]}) == 3


def test_group_with_candidate():
    vals = np.array([1, 2, 1, 2, 3], np.int32)
    col = Column.from_numpy(vals, I32)
    cand = Cand.dense(5, 0, 4)  # exclude last row
    g = G.group(col, cand)
    assert g.ngroups == 2
    assert groups_of(g, 5)[4] == -1


def test_group_nils_form_a_group():
    vals = np.array([1, NIL32, 1, NIL32], np.int32)
    col = Column.from_numpy(vals, I32)
    g = G.group(col)
    assert g.ngroups == 2
    ids = groups_of(g, 4)
    assert ids[1] == ids[3] and ids[0] == ids[2] and ids[0] != ids[1]


def test_group_sum_count_avg():
    k = Column.from_strings(["a", "b", "a", "b", "a"])
    v = Column.from_numpy(np.array([10, 20, 30, 40, NIL32], np.int32), I32)
    g = G.group(k)
    s = A.group_sum(v, g)
    out = {}
    # map group of row i → sum
    ids = groups_of(g, 5)
    sums = np.asarray(s.data[:2])
    assert sums[ids[0]] == 40      # a: 10+30 (nil skipped)
    assert sums[ids[1]] == 60      # b: 20+40
    cnt = A.group_count(v, g)
    c = np.asarray(cnt.data[:2])
    assert c[ids[0]] == 2 and c[ids[1]] == 2
    cnt_star = A.group_count(None, g)
    c2 = np.asarray(cnt_star.data[:2])
    assert c2[ids[0]] == 3 and c2[ids[1]] == 2
    avg, _s, _c = A.group_avg(v, g)
    av = np.asarray(avg.data[:2])
    assert av[ids[0]] == 20.0 and av[ids[1]] == 30.0


def test_group_sum_no_skip_nils():
    k = Column.from_strings(["a", "a", "b"])
    v = Column.from_numpy(np.array([10, NIL32, 5], np.int32), I32)
    g = G.group(k)
    s = A.group_sum(v, g, skip_nils=False)
    ids = groups_of(g, 3)
    sums = np.asarray(s.data[:2])
    assert sums[ids[0]] == NIL64   # nil poisons the group
    assert sums[ids[2]] == 5


def test_min_max():
    k = Column.from_strings(["a", "b", "a", "b"])
    v = Column.from_numpy(np.array([3.0, 1.0, 7.0, np.nan]), F64)
    g = G.group(k)
    ids = groups_of(g, 4)
    mn = np.asarray(A.group_min(v, g).data[:2])
    mx = np.asarray(A.group_max(v, g).data[:2])
    assert mn[ids[0]] == 3.0 and mx[ids[0]] == 7.0
    assert mn[ids[1]] == 1.0 and mx[ids[1]] == 1.0


def test_scalar_aggs():
    v = Column.from_numpy(np.array([1, 2, 3, NIL32], np.int32), I32)
    assert int(A.scalar_sum(v).data[0]) == 6
    assert int(A.scalar_count(v).data[0]) == 3
    assert int(A.scalar_count(base=v).data[0]) == 4
    assert int(A.scalar_min(v).data[0]) == 1
    assert int(A.scalar_max(v).data[0]) == 3


def test_aggregate_under_candidate():
    v = Column.from_numpy(np.array([1, 100, 2, 200, 3], np.int32), I32)
    cand = S.thetaselect(v, None, 10, "<")
    assert int(A.scalar_sum(v, cand).data[0]) == 6
    assert int(A.scalar_count(v, cand).data[0]) == 3
