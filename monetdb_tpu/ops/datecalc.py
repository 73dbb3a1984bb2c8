"""Date/time kernels — the reference's gdk_time.c (date arithmetic,
component extraction, month arithmetic with day clamping) over epoch-day
int32 (DATE), µs-since-epoch int64 (TIMESTAMP) and µs-of-day int64 (TIME)
columns.

Uses the standard civil-from-days algorithm (Howard Hinnant's public-domain
date algorithms) expressed as branch-free integer ops — jittable, exact for
the proleptic Gregorian calendar."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..column import Column, valid_mask
from ..dtypes import DATE, I32, I64, TIMESTAMP, Kind

__all__ = ["extract", "date_trunc", "add_interval_col"]

_NIL32 = np.int32(np.iinfo(np.int32).min)
_NIL64 = np.int64(np.iinfo(np.int64).min)
_US_PER_DAY = 86_400_000_000


@jax.jit
def _civil(z):
    """epoch days → (year, month, day) as int32 arrays."""
    z = z.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


@jax.jit
def _days_from_civil(y, m, d):
    """(year, month, day) → epoch days (inverse of _civil)."""
    y = y.astype(jnp.int64)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


@functools.partial(jax.jit, static_argnames=("field", "is_ts", "may_nil"))
def _extract(vals, count, *, field: str, is_ts: bool, may_nil: bool):
    live = valid_mask(vals.shape[0], count)
    nil_in = vals == (_NIL64 if vals.dtype.itemsize == 8 else _NIL32)
    if is_ts:
        days = jnp.floor_divide(vals, _US_PER_DAY)
        us = vals - days * _US_PER_DAY
    else:
        days = vals.astype(jnp.int64)
        us = jnp.zeros_like(days)
    y, m, d = _civil(days)
    if field == "year":
        out = y.astype(jnp.int64)
    elif field == "month":
        out = m.astype(jnp.int64)
    elif field == "day":
        out = d.astype(jnp.int64)
    elif field == "quarter":
        out = ((m - 1) // 3 + 1).astype(jnp.int64)
    elif field == "century":
        out = (jnp.where(y > 0, (y + 99) // 100, -((-y + 99) // 100))
               ).astype(jnp.int64)
    elif field == "decade":
        out = (y // 10).astype(jnp.int64)
    elif field == "dow":
        # ISO day of week 1=Monday..7=Sunday (gdk_time.c date_dayofweek);
        # epoch day 0 = Thursday = 4
        out = (days % 7 + 7 + 3) % 7 + 1
    elif field == "doy":
        jan1 = _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
        out = days - jan1 + 1
    elif field == "week":
        # ISO week number (gdk_time.c date_usweekofyear/isoweek): week of
        # the Thursday of this row's week
        dow0 = (days + 3) % 7          # 0=Monday
        dow0 = jnp.where(dow0 < 0, dow0 + 7, dow0)
        thursday = days - dow0 + 3
        ty, _tm, _td = _civil(thursday)
        jan1 = _days_from_civil(ty, jnp.ones_like(ty), jnp.ones_like(ty))
        out = (thursday - jan1) // 7 + 1
    elif field == "hour":
        out = us // 3_600_000_000
    elif field == "minute":
        out = (us // 60_000_000) % 60
    elif field == "second":
        out = (us // 1_000_000) % 60
    elif field == "microsecond":
        out = us % 60_000_000
    elif field == "epoch":
        out = days * 86_400 + us // 1_000_000
    else:  # pragma: no cover
        raise ValueError(field)
    bad = ~live | (nil_in if may_nil else jnp.zeros_like(live))
    return jnp.where(bad, _NIL64, out)


_FIELD_ALIASES = {
    "dayofmonth": "day", "dayofweek": "dow", "weekday": "dow",
    "dayofyear": "doy", "weekofyear": "week", "sql_second": "second",
}


def extract(field: str, col: Column) -> Column:
    """EXTRACT(field FROM col) / year(col)-family (gdk_time.c date_extract
    operators, modules/atoms/mtime.c)."""
    field = _FIELD_ALIASES.get(field, field)
    if col.typ.kind == Kind.TIME:
        # hour/minute/second over µs-of-day
        us = col.data
        live = valid_mask(col.cap, col.count)
        nil_in = us == _NIL64
        if field == "hour":
            out = us // 3_600_000_000
        elif field == "minute":
            out = (us // 60_000_000) % 60
        elif field == "second":
            out = (us // 1_000_000) % 60
        elif field == "epoch":
            out = us // 1_000_000
        else:
            raise ValueError(f"cannot extract {field} from TIME")
        out = jnp.where(~live | nil_in, _NIL64, out)
    else:
        is_ts = col.typ.kind == Kind.TIMESTAMP
        out = _extract(col.data, jnp.int64(col.count), field=field,
                       is_ts=is_ts, may_nil=not col.nonil)
    if field == "epoch":
        return Column(I64, out, col.count, nonil=col.nonil)
    out32 = jnp.where(out == _NIL64, jnp.int64(_NIL32), out).astype(jnp.int32)
    c = Column(I32, out32, col.count, nonil=col.nonil)
    if field == "year" and col.typ.kind == Kind.DATE and \
            col.minval is not None and col.maxval is not None:
        c.minval = 1970 + int(col.minval) // 366 - 1
        c.maxval = 1970 + int(col.maxval) // 365 + 1
    return c


@functools.partial(jax.jit, static_argnames=("field", "is_ts", "may_nil"))
def _trunc(vals, count, *, field: str, is_ts: bool, may_nil: bool):
    live = valid_mask(vals.shape[0], count)
    nil_in = vals == (_NIL64 if vals.dtype.itemsize == 8 else _NIL32)
    if is_ts:
        days = jnp.floor_divide(vals, _US_PER_DAY)
        us = vals - days * _US_PER_DAY
    else:
        days = vals.astype(jnp.int64)
        us = jnp.zeros_like(days)
    if field in ("microseconds", "milliseconds", "second", "minute", "hour"):
        q = {"microseconds": 1, "milliseconds": 1_000,
             "second": 1_000_000, "minute": 60_000_000,
             "hour": 3_600_000_000}[field]
        out = days * _US_PER_DAY + (us // q) * q
    else:
        y, m, d = _civil(days)
        one = jnp.ones_like(m)
        if field == "day":
            nd = days
        elif field == "week":
            dow0 = (days + 3) % 7
            dow0 = jnp.where(dow0 < 0, dow0 + 7, dow0)
            nd = days - dow0
        elif field == "month":
            nd = _days_from_civil(y, m, one)
        elif field == "quarter":
            qm = ((m - 1) // 3) * 3 + 1
            nd = _days_from_civil(y, qm, one)
        elif field == "year":
            nd = _days_from_civil(y, one, one)
        elif field == "decade":
            nd = _days_from_civil((y // 10) * 10, one, one)
        elif field == "century":
            cy = jnp.where(y > 0, ((y - 1) // 100) * 100 + 1, y)
            nd = _days_from_civil(cy, one, one)
        else:  # pragma: no cover
            raise ValueError(field)
        out = nd * _US_PER_DAY
    bad = ~live | (nil_in if may_nil else jnp.zeros_like(live))
    return jnp.where(bad, _NIL64, out)


def date_trunc(field: str, col: Column) -> Column:
    """date_trunc('field', ts) (reference sql/scripts/39_analytics:
    sys.date_trunc over mtime)."""
    is_ts = col.typ.kind == Kind.TIMESTAMP
    out = _trunc(col.data, jnp.int64(col.count), field=field, is_ts=is_ts,
                 may_nil=not col.nonil)
    return Column(TIMESTAMP, out, col.count, nonil=col.nonil)


@functools.partial(jax.jit, static_argnames=("months", "may_nil"))
def _add_months(days, count, *, months: int, may_nil: bool):
    live = valid_mask(days.shape[0], count)
    nil_in = days == _NIL32 if may_nil else jnp.zeros_like(live)
    y, m, d = _civil(days)
    t = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1) + months
    ny = t // 12
    nm = t % 12 + 1
    # clamp day to the target month's length (gdk_time.c date_add_month)
    leap = ((ny % 4 == 0) & (ny % 100 != 0)) | (ny % 400 == 0)
    mdays = jnp.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                      jnp.int64)[nm - 1]
    mdays = jnp.where((nm == 2) & leap, 29, mdays)
    nd = jnp.minimum(d.astype(jnp.int64), mdays)
    out = _days_from_civil(ny, nm, nd)
    return jnp.where(~live | nil_in, jnp.int64(_NIL32), out)


def add_interval_col(col: Column, amount: int, unit: str) -> Column:
    """column ± interval (BATcalc + mtime addition operators)."""
    if unit == "quarter":
        amount, unit = amount * 3, "month"
    if unit == "week":
        amount, unit = amount * 7, "day"
    is_ts = col.typ.kind == Kind.TIMESTAMP
    if unit in ("year", "month"):
        months = amount * 12 if unit == "year" else amount
        if is_ts:
            days = jnp.floor_divide(col.data, _US_PER_DAY)
            us = col.data - days * _US_PER_DAY
            nd = _add_months(days.astype(jnp.int32), jnp.int64(col.count),
                             months=months, may_nil=False)
            nil_in = col.data == _NIL64
            out = jnp.where(nil_in, _NIL64, nd * _US_PER_DAY + us)
            return Column(TIMESTAMP, out, col.count, nonil=col.nonil)
        out64 = _add_months(col.data, jnp.int64(col.count), months=months,
                            may_nil=not col.nonil)
        out = jnp.where(out64 == _NIL32, jnp.int64(_NIL32), out64) \
            .astype(jnp.int32)
        return Column(DATE, out, col.count, nonil=col.nonil)
    if unit in ("hour", "minute", "second") or is_ts:
        us = {"day": _US_PER_DAY, "hour": 3_600_000_000,
              "minute": 60_000_000, "second": 1_000_000}[unit] * amount
        if is_ts:
            data = col.data
        else:   # DATE promotes to TIMESTAMP under sub-day arithmetic
            data = col.data.astype(jnp.int64) * _US_PER_DAY
            nil_in = col.data == _NIL32
            data = jnp.where(nil_in, _NIL64, data)
        live = valid_mask(col.cap, col.count)
        nil_in = data == _NIL64
        out = jnp.where(~live | nil_in, _NIL64, data + us)
        return Column(TIMESTAMP, out, col.count, nonil=col.nonil)
    # DATE ± days
    live = valid_mask(col.cap, col.count)
    nil_in = col.data == _NIL32
    out = jnp.where(~live | nil_in, _NIL32,
                    col.data + np.int32(amount))
    return Column(DATE, out, col.count, nonil=col.nonil)
