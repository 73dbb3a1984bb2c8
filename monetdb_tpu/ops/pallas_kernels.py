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

__all__ = ["q1_grouped_sums", "grouped_sum_limbs", "seg_sum64",
           "SEG_SUM_BLOCK"]

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
# engine-facing: exact int64 segmented sum over a small dense domain
# ---------------------------------------------------------------------------

SEG_SUM_BLOCK = _BLOCK     # input length must be a multiple of this (16384)

_NL64 = 6   # accumulator rows per group: lo_lo, lo_hi, hi_lo, hi_hi, neg, cnt


def _seg_sum64_kernel(sid_ref, lo_ref, hi_ref, out_ref, *, domain: int):
    """Per-block grouped limb accumulation of int64 values passed as
    (lo32, hi32) int32 halves.  Value identity (two's complement):
        v = hi32·2^32 + lo32 + (lo32 < 0)·2^32
    so per group we accumulate the 16-bit limbs of lo32 and hi32 plus a
    negative-lo32 count; every per-lane partial stays < 2^23 (128
    sublanes × 16-bit limbs), safely inside int32."""
    sid = sid_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    neg = jnp.where(lo < _I32(0), _I32(1), _I32(0))
    limbs = (lo & _I32(0xFFFF), lo >> _I32(16),
             hi & _I32(0xFFFF), hi >> _I32(16),
             neg, jnp.ones_like(lo))
    acc = jnp.zeros((domain * _NL64, _LANES), _I32)
    for g in range(domain):
        mg = sid == _I32(g)
        for k, limb in enumerate(limbs):
            row = jnp.sum(jnp.where(mg, limb, _I32(0)), axis=0,
                          keepdims=True, dtype=_I32)
            acc = _accumulate_rows(acc, row, g * _NL64 + k)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("domain", "interpret"))
def seg_sum64(sid, vals, *, domain: int, interpret: bool = False):
    """Exact per-segment sum + count of int64 ``vals`` over segment ids
    ``sid`` in [0, domain) (rows with sid outside that range are
    excluded).  Input length must be a multiple of SEG_SUM_BLOCK.
    Returns (sums int64[domain], counts int64[domain]).

    This is the engine's hot grouped-aggregate kernel (the reference's
    BATgroupsum loop, gdk/gdk_aggr.c:900): one HBM pass, ~5× the
    throughput of the one-hot XLA form on TPU v5e (measured 1946 vs
    395 GB/s at 16M rows, domain 8)."""
    n = sid.shape[0]
    assert n % _BLOCK == 0, n
    grid = n // _BLOCK
    shape2 = (n // _LANES, _LANES)
    v = vals.astype(jnp.int64)
    lo32 = v.astype(jnp.int32)                  # truncating convert
    hi32 = (v >> 32).astype(jnp.int32)
    sid32 = jnp.where((sid >= 0) & (sid < domain), sid,
                      domain).astype(jnp.int32)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))
    rows = domain * _NL64
    with jax.enable_x64(False):   # see q1_grouped_sums
        out = pl.pallas_call(
            functools.partial(_seg_sum64_kernel, domain=domain),
            grid=(grid,),
            in_specs=[spec] * 3,
            out_specs=pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, _LANES), jnp.int32),
            interpret=interpret,
        )(sid32.reshape(shape2), lo32.reshape(shape2),
          hi32.reshape(shape2))
    p = out.astype(jnp.int64).sum(axis=(0, 2)).reshape(domain, _NL64)
    lo_sum = p[:, 0] + (p[:, 1] << 16)
    hi_sum = p[:, 2] + (p[:, 3] << 16)
    sums = lo_sum + ((hi_sum + p[:, 4]) << 32)
    return sums, p[:, 5]


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
