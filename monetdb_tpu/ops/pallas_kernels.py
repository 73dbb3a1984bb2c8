"""Pallas TPU kernels for the hot grouped-aggregation path.

Mosaic has no 64-bit types, so exact integer aggregation uses **16-bit limb
accumulation in int32**: every per-row measure is split into 16-bit limbs,
each limb is masked-summed per group *per lane* inside a block (limb < 2^16,
128 sublanes ⇒ lane-sum < 2^23, safely in int32), and a small XLA epilogue
reduces lanes and blocks in int64 and recombines limbs into exact totals.
One pass over HBM; all in-kernel reductions are axis reductions (rank-0
reductions and 64-bit converts don't lower on this Mosaic version), and all
literals are explicit int32 (weak-typed Python ints trace as int64 under
the engine's x64 mode and hit Mosaic's unsupported-convert path).

This is the speed-of-light form of the reference's grouped aggregate
(BATgroupsum, gdk/gdk_aggr.c:900) for small dense group domains — the
shape every SQL GROUP BY over dictionary-encoded keys takes in this engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["q1_grouped_sums", "grouped_sum_limbs"]

_BLOCK_ROWS = 128          # sublanes per block → 128×128 = 16384 rows/block
_LANES = 128
_BLOCK = _BLOCK_ROWS * _LANES

_I32 = jnp.int32


def _accumulate_rows(acc, row_sums, row_index: int):
    """acc[row_index, :] += row_sums — expressed as a broadcast select so
    no scatter/scalar store is needed."""
    ri = jax.lax.broadcasted_iota(_I32, acc.shape, 0)
    return acc + jnp.where(ri == _I32(row_index), row_sums, _I32(0))


_NLIMB = 11


def _q1_kernel(cut_ref, code_ref, ship_ref, qty_ref, extp_ref, disc_ref,
               tax_ref, out_ref, *, domain: int):
    cutoff = cut_ref[0, 0]
    code = code_ref[:]
    m = (code >= _I32(0)) & (ship_ref[:] <= cutoff)
    qty = qty_ref[:]
    extp = extp_ref[:]
    disc = disc_ref[:]
    tax = tax_ref[:]
    one_minus = _I32(100) - disc
    op = _I32(100) + tax
    dp = extp * one_minus                        # < 2^31
    dph = dp >> _I32(16)                         # < 2^15
    dpl = dp & _I32(0xFFFF)
    x = dph * op                                 # < 2^22
    y = dpl * op                                 # < 2^23
    ones = jnp.ones_like(qty)
    limbs = (
        qty,                                           # 0: qty (< 2^16)
        extp & _I32(0xFFFF), extp >> _I32(16),         # 1,2: extendedprice
        dpl, dph,                                      # 3,4: disc_price
        x & _I32(0xFFFF), x >> _I32(16),               # 5,6: charge hi part
        y & _I32(0xFFFF), y >> _I32(16),               # 7,8: charge lo part
        disc,                                          # 9: discount
        ones,                                          # 10: count
    )
    acc = jnp.zeros((domain * _NLIMB, _LANES), _I32)
    for g in range(domain):
        mg = m & (code == _I32(g))
        for k, limb in enumerate(limbs):
            row = jnp.sum(jnp.where(mg, limb, _I32(0)), axis=0,
                          keepdims=True, dtype=_I32)      # (1, 128)
            acc = _accumulate_rows(acc, row, g * _NLIMB + k)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("domain",))
def q1_grouped_sums(code, shipdate, qty, extp, disc, tax, cutoff,
                    *, domain: int = 8):
    """Fused TPC-H Q1 aggregation over int32 inputs (1-D, padded so that
    len % 16384 == 0, padding rows code == -1). Returns int64 arrays
    (sum_qty, sum_extp, sum_disc_price, sum_charge, sum_disc, count) of
    length `domain`."""
    n = code.shape[0]
    assert n % _BLOCK == 0, n
    grid = n // _BLOCK
    shape2 = (n // _LANES, _LANES)

    def as2d(a):
        return a.reshape(shape2)

    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    rows = domain * _NLIMB
    # Mosaic rejects kernels traced under jax_enable_x64 (index maps and
    # weak constants become i64, which it cannot legalize) — trace the
    # pallas_call in 32-bit mode; the int64 epilogue stays outside
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_q1_kernel, domain=domain),
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [spec] * 6,
            out_specs=pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, _LANES), jnp.int32),
        )(jnp.asarray([[cutoff]], jnp.int32), as2d(code), as2d(shipdate),
          as2d(qty), as2d(extp), as2d(disc), as2d(tax))

    # epilogue: reduce blocks + lanes in int64, recombine limbs
    p = out.astype(jnp.int64).sum(axis=(0, 2)).reshape(domain, _NLIMB)
    sum_qty = p[:, 0]
    sum_extp = p[:, 1] + (p[:, 2] << 16)
    sum_dp = p[:, 3] + (p[:, 4] << 16)
    sum_ch = p[:, 7] + ((p[:, 5] + p[:, 8]) << 16) + (p[:, 6] << 32)
    sum_disc = p[:, 9]
    count = p[:, 10]
    return sum_qty, sum_extp, sum_dp, sum_ch, sum_disc, count


# ---------------------------------------------------------------------------
# generic small-domain grouped sum (engine-facing)
# ---------------------------------------------------------------------------


def _gsum_kernel(code_ref, val_ref, mask_ref, out_ref, *, domain: int):
    code = code_ref[:]
    m = mask_ref[:] != _I32(0)
    v = val_ref[:]
    limbs = (v & _I32(0xFFFF), v >> _I32(16), jnp.ones_like(v))
    acc = jnp.zeros((domain * 3, _LANES), _I32)
    for g in range(domain):
        mg = m & (code == _I32(g))
        for k, limb in enumerate(limbs):
            row = jnp.sum(jnp.where(mg, limb, _I32(0)), axis=0,
                          keepdims=True, dtype=_I32)
            acc = _accumulate_rows(acc, row, g * 3 + k)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("domain",))
def grouped_sum_limbs(code, values, mask, *, domain: int):
    """Exact grouped sum + count of non-negative int32 values over a dense
    code domain. Inputs 1-D int32, len % 16384 == 0. Returns (sums int64,
    counts int64), each of length `domain`."""
    n = code.shape[0]
    assert n % _BLOCK == 0, n
    grid = n // _BLOCK
    shape2 = (n // _LANES, _LANES)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    with jax.enable_x64(False):   # see q1_grouped_sums
        out = pl.pallas_call(
            functools.partial(_gsum_kernel, domain=domain),
            grid=(grid,),
            in_specs=[spec] * 3,
            out_specs=pl.BlockSpec((1, domain * 3, _LANES),
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, domain * 3, _LANES),
                                           jnp.int32),
        )(code.reshape(shape2), values.reshape(shape2),
          mask.astype(jnp.int32).reshape(shape2))
    p = out.astype(jnp.int64).sum(axis=(0, 2)).reshape(domain, 3)
    return p[:, 0] + (p[:, 1] << 16), p[:, 2]
