"""Pallas grouped-aggregation kernels: exactness vs host oracle (runs in
interpret mode on the CPU backend; the real-chip run happens in bench.py)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from monetdb_tpu.ops import pallas_kernels as PK


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    # the kernels capture pl.pallas_call at call time via the module import
    monkeypatch.setattr(PK.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def test_q1_grouped_sums_exact():
    n = PK._BLOCK * 3
    rng = np.random.default_rng(7)
    code = rng.integers(0, 6, n).astype(np.int32)
    code[-100:] = -1                       # padding rows
    ship = rng.integers(8035, 10561, n).astype(np.int32)
    qty = rng.integers(100, 5100, n).astype(np.int32)
    extp = (qty.astype(np.int64) * rng.integers(90, 2000, n)).astype(np.int32)
    disc = rng.integers(0, 11, n).astype(np.int32)
    tax = rng.integers(0, 9, n).astype(np.int32)
    out = PK.q1_grouped_sums(*[jnp.asarray(a) for a in
                               (code, ship, qty, extp, disc, tax)],
                             np.int32(10471), domain=8)
    got = [np.asarray(o) for o in out]
    m = (ship <= 10471) & (code >= 0)
    dp = extp.astype(object) * (100 - disc)
    ch = dp * (100 + tax)
    for g in range(8):
        mg = m & (code == g)
        want = [qty[mg].sum(), extp[mg].astype(object).sum(), dp[mg].sum(),
                ch[mg].sum(), disc[mg].sum(), mg.sum()]
        for j, w in enumerate(want):
            assert int(got[j][g]) == int(w), (g, j)


def test_grouped_sum_limbs_exact():
    n = PK._BLOCK * 2
    rng = np.random.default_rng(3)
    code = rng.integers(0, 13, n).astype(np.int32)
    vals = rng.integers(0, 2**30, n).astype(np.int32)
    mask = (rng.random(n) < 0.7)
    sums, cnts = PK.grouped_sum_limbs(jnp.asarray(code), jnp.asarray(vals),
                                      jnp.asarray(mask), domain=13)
    sums, cnts = np.asarray(sums), np.asarray(cnts)
    for g in range(13):
        mg = mask & (code == g)
        assert int(sums[g]) == int(vals[mg].astype(object).sum())
        assert int(cnts[g]) == int(mg.sum())


def test_seg_sum64_exact_negatives_and_excluded():
    """seg_sum64: exact int64 grouped sums incl. negative values, values
    beyond int32, and excluded rows (sid == domain)."""
    n = PK.SEG_SUM_BLOCK * 2
    domain = 5
    rng = np.random.default_rng(11)
    sid = rng.integers(0, domain + 1, n).astype(np.int64)
    vals = rng.integers(-(2 ** 45), 2 ** 45, n).astype(np.int64)
    s, c = PK.seg_sum64(jnp.asarray(sid), jnp.asarray(vals),
                        domain=domain, interpret=True)
    for g in range(domain):
        mg = sid == g
        assert int(s[g]) == int(vals[mg].sum())
        assert int(c[g]) == int(mg.sum())


def test_seg_sum64_matches_onehot_segreduce():
    """The wired fast path must agree with the one-hot strategy it
    replaces (exec/fragment.py _SegReduce.sum)."""
    n = PK.SEG_SUM_BLOCK
    domain = 8
    rng = np.random.default_rng(12)
    sid = rng.integers(0, domain + 1, n).astype(np.int64)
    vals = np.where(sid < domain, rng.integers(0, 10 ** 12, n), 0)
    oh = sid[:, None] == np.arange(domain)[None, :]
    want = np.where(oh, vals[:, None], 0).sum(axis=0)
    s, _ = PK.seg_sum64(jnp.asarray(sid), jnp.asarray(vals),
                        domain=domain, interpret=True)
    assert (np.asarray(s) == want).all()
