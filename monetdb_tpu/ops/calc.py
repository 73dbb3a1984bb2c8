"""Bulk elementwise arithmetic — the reference's gdk_calc family
(gdk/gdk_calc.c, gdk_calc_addsub.c, gdk_calc_mul.c, gdk_calc_div.c,
gdk_calc_mod.c, gdk_calc_compare.h, gdk_calc_convert.c, ~16k LoC of
macro-expanded per-type loops collapsed here into a handful of jitted
kernels).

Semantics preserved from the reference:

* nil propagation: any nil operand ⇒ nil result (sentinel ints / NaN floats).
* overflow: integer add/sub/mul raise ``CalcOverflow`` exactly like the
  reference's ON_OVERFLOW macros (gdk/gdk_calc_addsub.c:44-47) — detected
  on device with an exact widened/sign-trick check, reduced to one flag,
  raised on the host.
* int division/modulo truncate toward zero (C semantics, lax.div/lax.rem);
  division by zero raises ``CalcDivZero`` (SQLSTATE 22012 in the reference).
* comparisons return three-valued int8 {0, 1, nil} (the reference's bit
  type with nil, gdk_calc_compare.h).
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..column import Column, valid_mask
from ..dtypes import I8, SQLType, Kind, common_numeric

__all__ = ["CalcError", "CalcOverflow", "CalcDivZero", "binop", "compare",
           "unop", "ifthenelse", "convert", "isnil"]


class CalcError(Exception):
    pass


class CalcOverflow(CalcError):
    pass


class CalcDivZero(CalcError):
    pass


def _nilmask(x):
    if x.dtype.kind == "f":
        return jnp.isnan(x)
    if x.dtype.kind == "b":
        return jnp.zeros(x.shape, jnp.bool_)
    return x == jnp.iinfo(x.dtype).min


def _nil_of(dtype):
    if dtype.kind == "f":
        return dtype.type(np.nan)
    if dtype.kind == "b":
        return np.bool_(False)
    return dtype.type(np.iinfo(dtype).min)


# ---------------------------------------------------------------------------
# binary arithmetic kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("op", "check", "out_dtype_s",
                                             "a_nil", "b_nil"))
def _binop(a, b, count, *, op: str, check: bool, out_dtype_s: str,
           a_nil: bool, b_nil: bool):
    out_dtype = jnp.dtype(out_dtype_s)
    live = valid_mask(a.shape[0] if a.ndim else b.shape[0], count)
    nil_in = jnp.zeros_like(live)
    if a_nil:
        nil_in = nil_in | _nilmask(a)
    if b_nil:
        nil_in = nil_in | _nilmask(b)
    valid = live & ~nil_in

    ai = a.astype(out_dtype)
    bi = b.astype(out_dtype)
    err = jnp.zeros((), jnp.int32)
    is_int = out_dtype.kind == "i"

    if op == "add":
        res = ai + bi
        if check and is_int:
            ovf = ((ai ^ res) & (bi ^ res)) < 0
            err = jnp.max(jnp.where(valid & ovf, 1, 0)).astype(jnp.int32)
    elif op == "sub":
        res = ai - bi
        if check and is_int:
            ovf = ((ai ^ bi) & (ai ^ res)) < 0
            err = jnp.max(jnp.where(valid & ovf, 1, 0)).astype(jnp.int32)
    elif op == "mul":
        res = ai * bi
        if check and is_int:
            if out_dtype.itemsize < 8:
                wide = ai.astype(jnp.int64) * bi.astype(jnp.int64)
                ovf = wide != res.astype(jnp.int64)
            else:
                # exact check: b != 0 and res / b != a  (trunc division)
                bz = bi == 0
                q = jax.lax.div(res, jnp.where(bz, 1, bi))
                ovf = (~bz) & (q != ai)
                # high-bit corner: a = min, b = -1
                ovf = ovf | ((ai == jnp.iinfo(jnp.int64).min) & (bi == -1))
            err = jnp.max(jnp.where(valid & ovf, 1, 0)).astype(jnp.int32)
    elif op == "div":
        if is_int:
            bz = bi == 0
            res = jax.lax.div(ai, jnp.where(bz, 1, bi))
            err = jnp.max(jnp.where(valid & bz, 2, 0)).astype(jnp.int32)
            if check:
                ovf = (ai == jnp.iinfo(out_dtype).min) & (bi == -1)
                err = jnp.maximum(err, jnp.max(
                    jnp.where(valid & ovf, 1, 0)).astype(jnp.int32))
        else:
            bz = bi == 0
            res = ai / jnp.where(bz, 1, bi)
            err = jnp.max(jnp.where(valid & bz, 2, 0)).astype(jnp.int32)
    elif op == "mod":
        if is_int:
            bz = bi == 0
            res = jax.lax.rem(ai, jnp.where(bz, 1, bi))
            err = jnp.max(jnp.where(valid & bz, 2, 0)).astype(jnp.int32)
        else:
            bz = bi == 0
            res = jnp.where(bz, jnp.nan, jnp.where(
                jnp.isnan(ai / jnp.where(bz, 1.0, bi)), jnp.nan,
                ai - jnp.trunc(ai / jnp.where(bz, 1.0, bi)) * bi))
            err = jnp.zeros((), jnp.int32)
    elif op == "min":
        res = jnp.minimum(ai, bi)
    elif op == "max":
        res = jnp.maximum(ai, bi)
    elif op == "and":
        res = ai & bi
    elif op == "or":
        res = ai | bi
    elif op == "xor":
        res = ai ^ bi
    elif op == "lsh":
        res = ai << bi
    elif op == "rsh":
        res = ai >> bi
    else:  # pragma: no cover
        raise ValueError(op)

    nil = _nil_of(np.dtype(out_dtype_s))
    res = jnp.where(valid, res, nil)
    return res, err


def _coerce_scalar(v, dtype):
    return jnp.asarray(np.dtype(dtype).type(v))


def binop(op: str, a: Column, b: Union[Column, int, float],
          out_typ: Optional[SQLType] = None) -> Column:
    """BATcalc<op> (e.g. BATcalcadd gdk/gdk_calc_addsub.c:1480)."""
    if isinstance(b, Column):
        assert a.count == b.count, (a.count, b.count)
        bt, b_nonil, b_data = b.typ, b.nonil, b.data
    else:
        bt = a.typ
        b_nonil, b_data = True, _coerce_scalar(b, a.typ.np_dtype)
    if out_typ is None:
        out_typ = common_numeric(a.typ, bt)
    check = bool(config.get("overflow_checks")) and op in ("add", "sub", "mul", "div")
    res, err = _binop(a.data, b_data, jnp.int64(a.count), op=op, check=check,
                      out_dtype_s=out_typ.np_dtype.str,
                      a_nil=not a.nonil, b_nil=not b_nonil)
    if check or op in ("div", "mod"):
        e = int(err)
        if e == 1:
            raise CalcOverflow(f"22003!overflow in calculation ({op})")
        if e == 2:
            raise CalcDivZero("22012!division by zero")
    return Column(out_typ, res, a.count, nonil=a.nonil and b_nonil)


# ---------------------------------------------------------------------------
# comparisons → three-valued int8
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("op", "a_nil", "b_nil"))
def _compare(a, b, count, *, op: str, a_nil: bool, b_nil: bool):
    cap = a.shape[0] if a.ndim else b.shape[0]
    live = valid_mask(cap, count)
    nil_in = jnp.zeros_like(live)
    if a_nil:
        nil_in = nil_in | _nilmask(a)
    if b_nil:
        nil_in = nil_in | _nilmask(b)
    if op == "eq":
        m = a == b
    elif op == "ne":
        m = a != b
    elif op == "lt":
        m = a < b
    elif op == "le":
        m = a <= b
    elif op == "gt":
        m = a > b
    elif op == "ge":
        m = a >= b
    else:  # pragma: no cover
        raise ValueError(op)
    out = m.astype(jnp.int8)
    nil8 = jnp.int8(np.iinfo(np.int8).min)
    out = jnp.where(live & nil_in, nil8, out)
    return jnp.where(live, out, nil8)


_CMP = {"=": "eq", "==": "eq", "!=": "ne", "<>": "ne", "<": "lt",
        "<=": "le", ">": "gt", ">=": "ge"}


def compare(op: str, a: Column, b: Union[Column, int, float]) -> Column:
    if isinstance(b, Column):
        bd, b_nonil = b.data, b.nonil
    else:
        bd, b_nonil = _coerce_scalar(b, a.typ.np_dtype), True
    res = _compare(a.data, bd, jnp.int64(a.count), op=_CMP[op],
                   a_nil=not a.nonil, b_nil=not b_nonil)
    return Column(I8, res, a.count, nonil=a.nonil and b_nonil)


# ---------------------------------------------------------------------------
# unary ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("op", "check", "a_nil"))
def _unop(a, count, *, op: str, check: bool, a_nil: bool):
    live = valid_mask(a.shape[0], count)
    nil_in = _nilmask(a) if a_nil else jnp.zeros_like(live)
    valid = live & ~nil_in
    err = jnp.zeros((), jnp.int32)
    if op == "neg":
        res = -a
        if check and a.dtype.kind == "i":
            ovf = a == jnp.iinfo(a.dtype).min + 1 - 1  # -min overflows
            ovf = a == jnp.iinfo(a.dtype).min
            # min is nil so it never appears as valid data; -min+1 is fine
            err = jnp.zeros((), jnp.int32)
    elif op == "abs":
        res = jnp.abs(a)
    elif op == "sign":
        res = jnp.sign(a).astype(jnp.int8)
    elif op == "not":
        res = ~a if a.dtype.kind in "iu" else jnp.logical_not(a)
    else:  # pragma: no cover
        raise ValueError(op)
    nil = _nil_of(res.dtype) if res.dtype.kind != "b" else False
    res = jnp.where(valid, res, nil)
    return res, err


def unop(op: str, a: Column, out_typ: Optional[SQLType] = None) -> Column:
    res, _ = _unop(a.data, jnp.int64(a.count), op=op,
                   check=bool(config.get("overflow_checks")),
                   a_nil=not a.nonil)
    if out_typ is None:
        out_typ = I8 if op == "sign" else a.typ
    return Column(out_typ, res, a.count, nonil=a.nonil)


def isnil(a: Column) -> Column:
    live = valid_mask(a.cap, a.count)
    m = _nilmask(a.data) & live
    from ..dtypes import BOOL
    return Column(BOOL, m, a.count, nonil=True)


# ---------------------------------------------------------------------------
# ifthenelse / convert
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("c_nil",))
def _ifthenelse(c, a, b, count, nil, *, c_nil: bool):
    cap = c.shape[0]
    live = valid_mask(cap, count)
    cond = c if c.dtype.kind == "b" else (c == 1)
    res = jnp.where(cond, a, b)
    if c_nil and c.dtype.kind != "b":
        res = jnp.where(_nilmask(c), nil, res)
    return jnp.where(live, res, nil)


def ifthenelse(cond: Column, a, b, out_typ: SQLType) -> Column:
    """BATcalcifthenelse: nil condition ⇒ nil result."""
    ad = a.data if isinstance(a, Column) else _coerce_scalar(a, out_typ.np_dtype)
    bd = b.data if isinstance(b, Column) else _coerce_scalar(b, out_typ.np_dtype)
    nil = out_typ.np_dtype.type(_nil_of(out_typ.np_dtype))
    res = _ifthenelse(cond.data, ad, bd, jnp.int64(cond.count), nil,
                      c_nil=not cond.nonil)
    nonil = ((not isinstance(a, Column)) or a.nonil) and \
            ((not isinstance(b, Column)) or b.nonil) and cond.nonil
    sd = None
    for c in (a, b):
        if isinstance(c, Column) and c.sdict is not None:
            sd = c.sdict
    return Column(out_typ, res, cond.count, nonil=nonil, sdict=sd)


@functools.partial(jax.jit, static_argnames=("out_dtype_s", "a_nil", "scale_up",
                                             "scale_down", "check"))
def _convert(a, count, *, out_dtype_s: str, a_nil: bool, scale_up: int,
             scale_down: int, check: bool):
    out_dtype = np.dtype(out_dtype_s)
    live = valid_mask(a.shape[0], count)
    nil_in = _nilmask(a) if a_nil else jnp.zeros_like(live)
    valid = live & ~nil_in
    err = jnp.zeros((), jnp.int32)
    x = a
    if a.dtype.kind == "f" and out_dtype.kind == "i":
        # round half away from zero (reference: dbl→int cast rounds)
        xs = x * (10 ** scale_up) if scale_up else x
        r = jnp.where(xs >= 0, jnp.floor(xs + 0.5), jnp.ceil(xs - 0.5))
        if check:
            lo = float(np.iinfo(out_dtype).min + 1)
            hi = float(np.iinfo(out_dtype).max)
            err = jnp.max(jnp.where(valid & ((r < lo) | (r > hi)), 1, 0)
                          ).astype(jnp.int32)
        res = r.astype(out_dtype)
    else:
        x = x.astype(jnp.int64) if (a.dtype.kind == "i" and
                                    (scale_up or scale_down)) else x
        if scale_up:
            x = x * (10 ** scale_up)
        if scale_down:
            d = 10 ** scale_down
            half = d // 2
            # round half away from zero on integer downscale
            x = jnp.where(x >= 0, (x + half) // d, -((-x + half) // d))
        if check and a.dtype.kind == "i" and out_dtype.kind == "i" \
                and out_dtype.itemsize < 8:
            lo = np.iinfo(out_dtype).min + 1
            hi = np.iinfo(out_dtype).max
            err = jnp.max(jnp.where(valid & ((x < lo) | (x > hi)), 1, 0)
                          ).astype(jnp.int32)
        if a.dtype.kind == "i" and out_dtype.kind == "f" and scale_down:
            res = (a.astype(out_dtype) / (10 ** scale_down))
        else:
            res = x.astype(out_dtype)
    nil = _nil_of(out_dtype)
    res = jnp.where(valid, res, nil)
    return res, err


def convert(a: Column, out_typ: SQLType, scale_up: int = 0,
            scale_down: int = 0) -> Column:
    """BATcalc type conversion (gdk/gdk_calc_convert.c) with decimal
    (re)scaling: scale_up multiplies by 10^k, scale_down divides with
    round-half-away-from-zero (the reference's decimal cast rounding)."""
    float_to_dec = a.typ.np_dtype.kind == "f" and out_typ.kind == Kind.DECIMAL
    dec_to_float = a.typ.kind == Kind.DECIMAL and out_typ.np_dtype.kind == "f"
    res, err = _convert(
        a.data, jnp.int64(a.count), out_dtype_s=out_typ.np_dtype.str,
        a_nil=not a.nonil,
        scale_up=scale_up if not dec_to_float else 0,
        scale_down=scale_down if not float_to_dec else scale_down,
        check=bool(config.get("overflow_checks")))
    if dec_to_float and a.typ.scale:
        res = res / (10.0 ** a.typ.scale)
    if int(err):
        raise CalcOverflow("22003!value exceeds limits of type")
    return Column(out_typ, res, a.count, nonil=a.nonil, sdict=None)
