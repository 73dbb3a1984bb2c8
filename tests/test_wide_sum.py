"""Wide (int128-equivalent) sum aggregates in the fragment path.

The reference accumulates sums in hge (int128, gdk/gdk.h:441; hge paths in
gdk/gdk_aggr.c), so SF100-scale decimal sums succeed instead of raising
22003.  Here the fused program carries every overflow-checked int64 sum as
paired 32-bit limbs (lo in [0, 2^32), hi = value >> 32), exact to 2^31
rows per group, psum-combinable under SPMD, recombined into python ints at
decode (engine._decode_wide).  Expression consumers narrow to int64 with a
precise fits-check (22003 beyond int64); ORDER BY sorts (hi, lo) directly.
"""

import numpy as np
import pytest

from monetdb_tpu.column import Column
from monetdb_tpu.dtypes import I32, I64, decimal
from monetdb_tpu.engine import Engine
from monetdb_tpu.ops.calc import CalcOverflow
from monetdb_tpu.table import Catalog, Table

N = 400_000
BIG = 40_000_000_000_000          # group 0: N * BIG = 1.6e19 > 2^63-1
SMALL = 9_000_000_000_000


def _catalog():
    g = np.repeat(np.arange(3), N).astype(np.int32)
    v = np.full(3 * N, SMALL, np.int64)
    v[:N] = BIG
    d = (v // 100).astype(np.int64)
    cat = Catalog()
    cat.add(Table.from_dict("t", {
        "g": Column.from_numpy(g, I32),
        "v": Column.from_numpy(v, I64),
        "d": Column.from_numpy(d, decimal(18, 2)),
    }))
    return cat


@pytest.fixture(scope="module")
def eng():
    return Engine(_catalog())


def test_grouped_bigint_sum_beyond_int64(eng):
    r = eng.query("select g, sum(v) from t group by g order by g")
    assert [(int(a), int(b)) for a, b in r.rows] == [
        (0, N * BIG), (1, N * SMALL), (2, N * SMALL)]


def test_decimal_sum_beyond_int64_exact(eng):
    from decimal import Decimal
    r = eng.query("select sum(d) from t")
    total = N * (BIG // 100) + 2 * N * (SMALL // 100)
    assert r.rows[0][0] == Decimal(total).scaleb(-2)


def test_scalar_sum_beyond_int64(eng):
    r = eng.query("select sum(v) from t")
    assert int(r.rows[0][0]) == N * (BIG + 2 * SMALL)


def test_order_by_wide_sum(eng):
    r = eng.query("select g, sum(v) as s from t group by g order by s desc")
    assert r.rows[0][0] == 0 and int(r.rows[0][1]) == N * BIG
    r2 = eng.query(
        "select g, sum(v) as s from t group by g order by s asc limit 1")
    assert r2.rows[0][0] in (1, 2)


def test_narrowing_consumer_raises_beyond_int64(eng):
    with pytest.raises(CalcOverflow):
        eng.query("select g, sum(v) + 1 from t group by g order by g")


def test_narrowing_consumer_exact_within_int64(eng):
    r = eng.query("select g, sum(g) + 1 as s from t group by g order by g")
    assert [(a, int(b)) for a, b in r.rows] == [
        (0, 1), (1, N + 1), (2, 2 * N + 1)]


def test_empty_group_sum_is_null(eng):
    r = eng.query("select sum(v) from t where g > 99")
    assert r.rows == [(None,)]


def test_wide_sum_fused_no_fallback(eng):
    from monetdb_tpu.exec.fragment import STATS
    before = dict(STATS)
    eng.query("select g, sum(v) from t group by g")
    assert STATS["fallbacks"] == before["fallbacks"]


def test_wide_sum_spmd_parity(eng):
    """Per-shard limb partials psum-combine exactly (the two-phase
    BATgroupavg3combine shape, gdk/gdk_aggr.c:2634)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("x",))
    meng = Engine(_catalog(), mesh=mesh)
    r = meng.query("select g, sum(v) from t group by g order by g")
    assert [(int(a), int(b)) for a, b in r.rows] == [
        (0, N * BIG), (1, N * SMALL), (2, N * SMALL)]
    from monetdb_tpu.exec.fragment import STATS
    assert STATS["spmd_runs"] > 0
