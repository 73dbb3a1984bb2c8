"""Multi-chip SPMD execution tests on the 8-virtual-device CPU mesh —
the N-local-workers pattern of the reference's distributed tests
(sql/test/remote/Tests/ssbm.SQL.py boots NWORKERS mservers; here the mesh
plays the worker pool and psum plays mat.pack+combine)."""

import jax
import numpy as np
import pytest

from monetdb_tpu.bench.tpch_gen import gen_tpch, _days
from monetdb_tpu.parallel import row_mesh, shard_array, sharded_q1, sharded_q6


@pytest.fixture(scope="module")
def data():
    return gen_tpch(0.01)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_q6_matches_host(data):
    li = data["lineitem"]
    mesh = row_mesh()
    step = sharded_q6(mesh)
    sd = shard_array(li["l_shipdate"], mesh, fill=0)
    di = shard_array(li["l_discount"], mesh, fill=-1)   # padding never matches
    qt = shard_array(li["l_quantity"], mesh, fill=1 << 40)
    ep = shard_array(li["l_extendedprice"].astype(np.int32), mesh)
    lo, hi = _days("1994-01-01"), _days("1995-01-01")
    got = int(step(sd, di, qt, ep,
                   np.int32(lo), np.int32(hi),
                   np.int64(5), np.int64(7), np.int64(2400)))
    m = ((li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)
         & (li["l_discount"] >= 5) & (li["l_discount"] <= 7)
         & (li["l_quantity"] < 2400))
    want = int((li["l_extendedprice"][m].astype(object)
                * li["l_discount"][m].astype(object)).sum())
    assert got == want


def test_sharded_q1_matches_host(data):
    li = data["lineitem"]
    mesh = row_mesh()
    rf = li["l_returnflag"]
    ls = li["l_linestatus"]
    rf_u = sorted(set(rf.tolist()))
    ls_u = sorted(set(ls.tolist()))
    code = (np.searchsorted(rf_u, rf) * len(ls_u)
            + np.searchsorted(ls_u, ls)).astype(np.int32)
    D = len(rf_u) * len(ls_u)
    step = sharded_q1(mesh, domain=D)
    args = [shard_array(code, mesh, fill=-1)] + [
        shard_array(li[c], mesh) for c in
        ("l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
         "l_tax")]
    cutoff = np.int32(_days("1998-12-01") - 90)
    sq, sb, sdp, sch, sdc, cnt = [np.asarray(x) for x in step(*args, cutoff)]

    m = li["l_shipdate"] <= int(cutoff)
    for g in range(D):
        gm = m & (code == g)
        assert int(cnt[g]) == int(gm.sum())
        assert int(sq[g]) == int(li["l_quantity"][gm].sum())
        dp = (li["l_extendedprice"][gm].astype(object)
              * (100 - li["l_discount"][gm].astype(object)))
        assert int(sdp[g]) == int(dp.sum())
        assert int(sch[g]) == int((dp * (100 + li["l_tax"][gm]
                                         .astype(object))).sum())


# ---------------------------------------------------------------------------
# SQL queries executed SPMD over the mesh through the fragment compiler
# (exec/fragment.py _run_spmd) — the plan-integrated analog of the
# reference's mitosis+mergetable pipeline (opt_mitosis.c:21,
# opt_mergetable.c:15-27): largest scan row-sharded, dense group-bys
# psum-combined, order/limit/build-side barriers all_gather-ed.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engines(data):
    from jax.sharding import Mesh
    from monetdb_tpu.bench.tpch_load import load_tables
    from monetdb_tpu.engine import Engine
    cat = load_tables(data)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    return Engine(cat), Engine(cat, mesh=mesh)


def _rows_equal(a, b):
    assert len(a.rows) == len(b.rows)
    for ra, rb in zip(a.rows, b.rows):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, rel=1e-9)
            else:
                assert x == y


@pytest.mark.parametrize("q", [1, 3, 5, 6, 13, 16, 18, 21])
def test_sql_multichip_parity(engines, q):
    """Engine.query over the 8-device mesh == single-device, row for row
    (covers psum group-by, gather barriers, expanding joins and distinct
    aggregates under SPMD)."""
    from monetdb_tpu.bench.tpch_queries import QUERIES
    from monetdb_tpu.exec import fragment as frag
    e1, e8 = engines
    spmd0 = frag.STATS["spmd_runs"]
    a = e1.query(QUERIES[q])
    b = e8.query(QUERIES[q])
    _rows_equal(a, b)
    assert frag.STATS["spmd_runs"] > spmd0, "mesh engine did not run SPMD"
