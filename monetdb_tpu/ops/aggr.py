"""Grouped aggregates — the reference's gdk_aggr.c family: BATgroupsum
(:900), BATgroupprod (:1575), BATgroupavg (:1801) + the exact 2-phase
decimal average BATgroupavg3/avg3combine (:1996/:2634), BATgroupcount
(:3069), BATgroupmin/max (:3561/:3720), quantiles (:4233) — as segmented
reductions over per-row group ids.

All take ``skip_nils`` (SQL aggregates skip nils; ``count(*)`` counts rows).
When ``skip_nils`` is false, any nil in a group makes that group's result
nil — preserved via a per-group nil-presence reduction.

The distributed decomposition the reference uses for partitioned plans
(mat_grp two-phase aggregation, monetdb5/optimizer/opt_mergetable.c:15-27)
falls out naturally: every aggregate here returns partials that combine
with a plain segment-add/min/max across shards (see parallel/), and
``avg`` keeps the exact (sum, count) pair like BATgroupavg3.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..column import Column, capacity_for, valid_mask
from ..dtypes import F64, I64, SQLType, Kind
from .group import GroupResult

__all__ = ["group_sum", "group_count", "group_avg", "group_min", "group_max",
           "group_prod", "scalar_sum", "scalar_count", "scalar_avg",
           "scalar_min", "scalar_max"]


def _nilmask(x):
    if x.dtype.kind == "f":
        return jnp.isnan(x)
    if x.dtype.kind == "b":
        return jnp.zeros(x.shape, jnp.bool_)
    return x == jnp.iinfo(x.dtype).min


def _nil_of(dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        return dtype.type(np.nan)
    return dtype.type(np.iinfo(dtype).min)


# ---------------------------------------------------------------------------
# core segmented reduction kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("op", "seg_cap", "skip_nils",
                                             "may_nil", "acc_dtype_s", "check"))
def _seg_reduce(x, ids, count, *, op: str, seg_cap: int, skip_nils: bool,
                may_nil: bool, acc_dtype_s: str, check: bool):
    acc_dtype = np.dtype(acc_dtype_s)
    cap = ids.shape[0]
    live = valid_mask(cap, count) & (ids >= 0)
    nilm = _nilmask(x) if may_nil else jnp.zeros(cap, jnp.bool_)
    use = live & ~nilm
    sid = jnp.where(use, ids.astype(jnp.int64), seg_cap)
    err = jnp.zeros((), jnp.int32)

    if op == "count":
        w = (live if not skip_nils else use).astype(jnp.int64)
        wid = jnp.where(live if not skip_nils else use,
                        ids.astype(jnp.int64), seg_cap)
        out = jnp.zeros(seg_cap + 1, jnp.int64).at[wid].add(w)[:seg_cap]
        cnt = out
        nil_in_group = jnp.zeros(seg_cap, jnp.bool_)
        return out, cnt, nil_in_group, err

    xa = x.astype(acc_dtype)
    if op == "sum":
        z = jnp.zeros(seg_cap + 1, acc_dtype)
        vals = jnp.where(use, xa, acc_dtype.type(0))
        out = z.at[sid].add(vals)[:seg_cap]
        if check and acc_dtype.kind == "i" and x.dtype.itemsize == 8:
            # running int64 sums can overflow: re-check via float magnitude
            fsum = jnp.zeros(seg_cap + 1, jnp.float64).at[sid].add(
                jnp.where(use, x.astype(jnp.float64), 0.0))[:seg_cap]
            ovf = jnp.abs(fsum) > 9.1e18
            err = jnp.max(jnp.where(ovf, 1, 0)).astype(jnp.int32)
    elif op == "prod":
        # log-free exact product only for small groups; use sequential
        # segment product via multiplicative scatter
        z = jnp.ones(seg_cap + 1, acc_dtype)
        vals = jnp.where(use, xa, acc_dtype.type(1))
        out = z.at[sid].mul(vals)[:seg_cap]
    elif op == "min":
        big = acc_dtype.type(np.inf) if acc_dtype.kind == "f" \
            else np.iinfo(acc_dtype).max
        z = jnp.full(seg_cap + 1, big, acc_dtype)
        vals = jnp.where(use, xa, big)
        out = z.at[sid].min(vals)[:seg_cap]
    elif op == "max":
        small = acc_dtype.type(-np.inf) if acc_dtype.kind == "f" \
            else acc_dtype.type(np.iinfo(acc_dtype).min)
        z = jnp.full(seg_cap + 1, small, acc_dtype)
        vals = jnp.where(use, xa, small)
        out = z.at[sid].max(vals)[:seg_cap]
    else:  # pragma: no cover
        raise ValueError(op)

    cnt = jnp.zeros(seg_cap + 1, jnp.int64).at[sid].add(
        use.astype(jnp.int64))[:seg_cap]
    lid = jnp.where(live, ids.astype(jnp.int64), seg_cap)
    nil_in_group = jnp.zeros(seg_cap + 1, jnp.bool_).at[lid].max(
        nilm & live)[:seg_cap]
    return out, cnt, nil_in_group, err


@functools.partial(jax.jit, static_argnames=("nil_s",))
def _fix_empty_and_nil(out, cnt, nil_in_group, *, nil_s):
    """Empty group or (non-skip_nils) nil-containing group ⇒ nil result."""
    nil = out.dtype.type(float(nil_s)) if out.dtype.kind == "f" else \
        out.dtype.type(int(nil_s))
    bad = (cnt == 0) | nil_in_group
    return jnp.where(bad, nil, out)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _acc_type(typ: SQLType, op: str) -> SQLType:
    if op in ("min", "max"):
        return typ
    if typ.np_dtype.kind == "f":
        return F64
    if typ.kind == Kind.DECIMAL:
        from ..dtypes import decimal
        return decimal(18, typ.scale)
    return I64


def group_sum(col: Column, g: GroupResult, skip_nils: bool = True,
              check_overflow: bool = True) -> Column:
    """BATgroupsum (gdk/gdk_aggr.c:900). Accumulates in int64/f64."""
    out_typ = _acc_type(col.typ, "sum")
    out, cnt, nig, err = _seg_reduce(
        col.data, g.ids, jnp.int64(g.base_count), op="sum",
        seg_cap=g.seg_cap, skip_nils=skip_nils, may_nil=not col.nonil,
        acc_dtype_s=out_typ.np_dtype.str, check=check_overflow)
    if check_overflow and int(err):
        from .calc import CalcOverflow
        raise CalcOverflow("22003!overflow in sum aggregate")
    nig = nig if not skip_nils else jnp.zeros_like(nig)
    res = _fix_empty_and_nil(out, cnt, nig, nil_s=_nil_of(out_typ.np_dtype))
    return Column(out_typ, res, g.ngroups, nonil=False)


def group_count(col: Optional[Column], g: GroupResult,
                skip_nils: bool = True) -> Column:
    """BATgroupcount; col=None = count(*) (counts candidate rows)."""
    if col is None:
        x = jnp.zeros(len(g.ids), jnp.int8)
        may_nil = False
        skip = False
    else:
        x, may_nil, skip = col.data, not col.nonil, skip_nils
    out, _, _, _ = _seg_reduce(x, g.ids, jnp.int64(g.base_count), op="count",
                               seg_cap=g.seg_cap, skip_nils=skip,
                               may_nil=may_nil, acc_dtype_s="<i8", check=False)
    return Column(I64, out, g.ngroups, nonil=True)


def group_avg(col: Column, g: GroupResult, skip_nils: bool = True):
    """BATgroupavg (gdk/gdk_aggr.c:1801): returns float64 average; also
    returns the exact (sum, count) pair — the associative decomposition of
    BATgroupavg3 (:1996) used for distributed combining."""
    sum_typ = _acc_type(col.typ, "sum")
    out, cnt, nig, _ = _seg_reduce(
        col.data, g.ids, jnp.int64(g.base_count), op="sum",
        seg_cap=g.seg_cap, skip_nils=skip_nils, may_nil=not col.nonil,
        acc_dtype_s=sum_typ.np_dtype.str, check=False)
    nig2 = nig if not skip_nils else jnp.zeros_like(nig)
    avg = _avg_div(out, cnt, nig2,
                   scale=col.typ.scale if col.typ.kind == Kind.DECIMAL else 0)
    sums = _fix_empty_and_nil(out, cnt, nig2, nil_s=_nil_of(sum_typ.np_dtype))
    return (Column(F64, avg, g.ngroups, nonil=False),
            Column(sum_typ, sums, g.ngroups, nonil=False),
            Column(I64, cnt, g.ngroups, nonil=True))


@functools.partial(jax.jit, static_argnames=("scale",))
def _avg_div(s, cnt, nil_in_group, *, scale: int = 0):
    f = s.astype(jnp.float64)
    if scale:
        f = f / (10.0 ** scale)
    a = f / jnp.maximum(cnt, 1)
    return jnp.where((cnt == 0) | nil_in_group, jnp.nan, a)


def _minmax(op, col: Column, g: GroupResult, skip_nils=True) -> Column:
    out_typ = col.typ
    out, cnt, nig, _ = _seg_reduce(
        col.data, g.ids, jnp.int64(g.base_count), op=op,
        seg_cap=g.seg_cap, skip_nils=skip_nils, may_nil=not col.nonil,
        acc_dtype_s=out_typ.np_dtype.str, check=False)
    nig = nig if not skip_nils else jnp.zeros_like(nig)
    res = _fix_empty_and_nil(out, cnt, nig, nil_s=_nil_of(out_typ.np_dtype))
    return Column(out_typ, res, g.ngroups, nonil=False, sdict=col.sdict)


def group_min(col, g, skip_nils=True):
    """BATgroupmin (gdk/gdk_aggr.c:3561)."""
    return _minmax("min", col, g, skip_nils)


def group_max(col, g, skip_nils=True):
    """BATgroupmax (gdk/gdk_aggr.c:3720)."""
    return _minmax("max", col, g, skip_nils)


def group_prod(col, g, skip_nils=True):
    out_typ = _acc_type(col.typ, "sum")
    out, cnt, nig, _ = _seg_reduce(
        col.data, g.ids, jnp.int64(g.base_count), op="prod",
        seg_cap=g.seg_cap, skip_nils=skip_nils, may_nil=not col.nonil,
        acc_dtype_s=out_typ.np_dtype.str, check=False)
    nig = nig if not skip_nils else jnp.zeros_like(nig)
    res = _fix_empty_and_nil(out, cnt, nig, nil_s=_nil_of(out_typ.np_dtype))
    return Column(out_typ, res, g.ngroups, nonil=False)


# ---------------------------------------------------------------------------
# scalar (ungrouped) aggregates — single-group reduction
# ---------------------------------------------------------------------------

def _one_group(col: Column, cand=None) -> GroupResult:
    from ..column import Cand
    if cand is not None and not cand.is_all():
        m = cand.as_mask(col.cap)
        ids = jnp.where(m, 0, -1).astype(jnp.int32)
    else:
        ids = jnp.where(valid_mask(col.cap, col.count), 0, -1).astype(jnp.int32)
    return GroupResult(ids, 1, col.count)


def scalar_sum(col, cand=None, skip_nils=True):
    return group_sum(col, _one_group(col, cand), skip_nils)


def scalar_count(col=None, cand=None, skip_nils=True, base=None):
    """count(col) or count(*) (col=None; ``base`` supplies the row shape)."""
    ref = col if col is not None else base
    g = _one_group(ref, cand)
    return group_count(col, g, skip_nils)


def scalar_avg(col, cand=None, skip_nils=True):
    return group_avg(col, _one_group(col, cand), skip_nils)


def scalar_min(col, cand=None):
    return group_min(col, _one_group(col, cand))


def scalar_max(col, cand=None):
    return group_max(col, _one_group(col, cand))


# ---------------------------------------------------------------------------
# statistical aggregates (gdk_aggr.c: BATgroupvariance/stdev :~2800,
# BATgroupmedian/quantile :4233) — two-pass moments and sort-based quantiles
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("seg_cap", "sample"))
def _var_kernel(x, ids, count, *, seg_cap: int, sample: bool):
    cap = ids.shape[0]
    live = valid_mask(cap, count) & (ids >= 0)
    nilm = _nilmask(x)
    use = live & ~nilm
    xf = jnp.where(use, x.astype(jnp.float64), 0.0)
    sid = jnp.where(use, ids.astype(jnp.int64), seg_cap)
    s1 = jnp.zeros(seg_cap + 1, jnp.float64).at[sid].add(xf)[:seg_cap]
    s2 = jnp.zeros(seg_cap + 1, jnp.float64).at[sid].add(xf * xf)[:seg_cap]
    n = jnp.zeros(seg_cap + 1, jnp.int64).at[sid].add(
        use.astype(jnp.int64))[:seg_cap]
    denom = jnp.maximum(n - 1, 1) if sample else jnp.maximum(n, 1)
    var = (s2 - s1 * s1 / jnp.maximum(n, 1)) / denom
    var = jnp.maximum(var, 0.0)  # fp guard
    bad = (n <= 1) if sample else (n == 0)
    return jnp.where(bad, jnp.nan, var), n


def group_var(col: Column, g: GroupResult, sample: bool = True,
              skip_nils: bool = True) -> Column:
    """BATgroupvariance; scale-aware for decimals (divides by 10^2s)."""
    var, _ = _var_kernel(col.data, g.ids, jnp.int64(g.base_count),
                         seg_cap=g.seg_cap, sample=sample)
    if col.typ.kind == Kind.DECIMAL and col.typ.scale:
        var = var / (10.0 ** (2 * col.typ.scale))
    return Column(F64, var, g.ngroups, nonil=False)


def group_stdev(col: Column, g: GroupResult, sample: bool = True,
                skip_nils: bool = True) -> Column:
    v = group_var(col, g, sample, skip_nils)
    return Column(F64, jnp.sqrt(v.data), g.ngroups, nonil=False)


@functools.partial(jax.jit, static_argnames=("seg_cap",))
def _quantile_kernel(x, ids, count, q, *, seg_cap: int):
    """Sort (gid, value) then gather the interpolated q-position per group."""
    cap = ids.shape[0]
    live = valid_mask(cap, count) & (ids >= 0)
    nilm = _nilmask(x)
    use = live & ~nilm
    gid = jnp.where(use, ids.astype(jnp.int64), seg_cap)
    xf = x.astype(jnp.float64)
    key = jnp.where(use, xf, jnp.inf)
    g_s, v_s = jax.lax.sort((gid, key), num_keys=2)
    # group start offsets + counts
    n = jnp.zeros(seg_cap + 1, jnp.int64).at[gid].add(
        use.astype(jnp.int64))[:seg_cap]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int64),
                              jnp.cumsum(n)])[:seg_cap]
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float64)
    lo = jnp.floor(pos).astype(jnp.int64)
    hi = jnp.ceil(pos).astype(jnp.int64)
    frac = pos - lo.astype(jnp.float64)
    vlo = v_s[jnp.clip(starts + lo, 0, cap - 1)]
    vhi = v_s[jnp.clip(starts + hi, 0, cap - 1)]
    out = vlo + (vhi - vlo) * frac
    return jnp.where(n == 0, jnp.nan, out)


def group_quantile(col: Column, g: GroupResult, q: float) -> Column:
    """BATgroupquantile_avg (gdk/gdk_aggr.c:4233): interpolated quantile."""
    out = _quantile_kernel(col.data, g.ids, jnp.int64(g.base_count),
                           jnp.float64(q), seg_cap=g.seg_cap)
    if col.typ.kind == Kind.DECIMAL and col.typ.scale:
        out = out / (10.0 ** col.typ.scale)
    return Column(F64, out, g.ngroups, nonil=False)


def group_median(col: Column, g: GroupResult) -> Column:
    return group_quantile(col, g, 0.5)


@functools.partial(jax.jit, static_argnames=("seg_cap", "sample", "want"))
def _covar_kernel(x, y, ids, count, *, seg_cap: int, sample: bool,
                  want: str):
    """Per-group covariance/correlation moments (BATgroupcovariance/
    BATgroupcorrelation, gdk/gdk_aggr.c ~2900): rows where either side is
    nil are skipped, matching the reference's pairwise nil rule."""
    cap = ids.shape[0]
    live = valid_mask(cap, count) & (ids >= 0)
    use = live & ~_nilmask(x) & ~_nilmask(y)
    xf = jnp.where(use, x.astype(jnp.float64), 0.0)
    yf = jnp.where(use, y.astype(jnp.float64), 0.0)
    sid = jnp.where(use, ids.astype(jnp.int64), seg_cap)

    def seg(v):
        return jnp.zeros(seg_cap + 1, jnp.float64).at[sid].add(v)[:seg_cap]

    n = jnp.zeros(seg_cap + 1, jnp.int64).at[sid].add(
        use.astype(jnp.int64))[:seg_cap]
    nf = jnp.maximum(n, 1).astype(jnp.float64)
    sx, sy = seg(xf), seg(yf)
    sxy = seg(xf * yf)
    cov_n = sxy - sx * sy / nf
    if want == "covar":
        denom = jnp.maximum(n - 1, 1) if sample else n
        out = cov_n / jnp.maximum(denom, 1).astype(jnp.float64)
        bad = (n <= 1) if sample else (n == 0)
        return jnp.where(bad, jnp.nan, out)
    sxx = seg(xf * xf) - sx * sx / nf
    syy = seg(yf * yf) - sy * sy / nf
    denom = jnp.sqrt(jnp.maximum(sxx * syy, 0.0))
    out = cov_n / jnp.where(denom == 0, 1.0, denom)
    return jnp.where((n == 0) | (denom == 0), jnp.nan, out)


def group_covar(col: Column, col2: Column, g: GroupResult,
                sample: bool = True) -> Column:
    """BATgroupcovariance_{sample,population} (gdk/gdk_aggr.c)."""
    out = _covar_kernel(col.data, col2.data, g.ids, jnp.int64(g.base_count),
                        seg_cap=g.seg_cap, sample=sample, want="covar")
    s = (col.typ.scale if col.typ.kind == Kind.DECIMAL else 0) + \
        (col2.typ.scale if col2.typ.kind == Kind.DECIMAL else 0)
    if s:
        out = out / (10.0 ** s)
    return Column(F64, out, g.ngroups, nonil=False)


def group_corr(col: Column, col2: Column, g: GroupResult) -> Column:
    """BATgroupcorrelation — scale-invariant, no decimal adjustment."""
    out = _covar_kernel(col.data, col2.data, g.ids, jnp.int64(g.base_count),
                        seg_cap=g.seg_cap, sample=True, want="corr")
    return Column(F64, out, g.ngroups, nonil=False)


def group_concat_host(col: Column, g: GroupResult, sep: str = ",") -> Column:
    """GROUP_CONCAT / LISTAGG (reference sql_aggr_str concat aggregate) —
    host-side over decoded strings (string building is inherently
    sequential; the group ids and codes come off-device in one transfer)."""
    ids = np.asarray(g.ids)
    n = int(g.base_count)
    ng = int(g.ngroups)
    if col.sdict is not None:
        codes = np.asarray(col.data[:n])
        vals = [None if c < 0 else str(col.sdict.values[c]) for c in codes]
    else:
        from ..dtypes import is_nil_np
        raw = np.asarray(col.data[:n])
        nil = is_nil_np(raw, col.typ)
        vals = [None if nil[i] else str(raw[i]) for i in range(n)]
    parts: list = [[] for _ in range(ng)]
    for i in range(n):
        gid = ids[i]
        if gid >= 0 and vals[i] is not None:
            parts[gid].append(vals[i])
    out = [sep.join(p) if p else None for p in parts]
    from ..storage.columns import column_from_pyvalues
    from ..dtypes import varchar
    return column_from_pyvalues(out, varchar())
