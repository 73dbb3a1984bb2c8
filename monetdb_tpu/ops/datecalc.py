"""Date/time kernels — the reference's gdk_time.c (date arithmetic,
component extraction) over epoch-day int32 columns.

Uses the standard civil-from-days algorithm (Howard Hinnant's public-domain
date algorithms) expressed as branch-free integer ops — jittable, exact for
the proleptic Gregorian calendar."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..column import Column, valid_mask
from ..dtypes import I32

__all__ = ["extract"]

_NIL32 = np.int32(np.iinfo(np.int32).min)


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


@functools.partial(jax.jit, static_argnames=("field", "may_nil"))
def _extract(days, count, *, field: str, may_nil: bool):
    live = valid_mask(days.shape[0], count)
    nil = days == _NIL32
    y, m, d = _civil(days)
    if field == "year":
        out = y
    elif field == "month":
        out = m
    elif field == "day":
        out = d
    elif field == "quarter":
        out = (m - 1) // 3 + 1
    else:  # pragma: no cover
        raise ValueError(field)
    bad = ~live | (nil if may_nil else jnp.zeros_like(live))
    return jnp.where(bad, _NIL32, out)


def extract(field: str, col: Column) -> Column:
    out = _extract(col.data, jnp.int64(col.count), field=field,
                   may_nil=not col.nonil)
    c = Column(I32, out, col.count, nonil=col.nonil)
    if field == "year" and col.minval is not None and col.maxval is not None:
        c.minval = 1970 + int(col.minval) // 366 - 1
        c.maxval = 1970 + int(col.maxval) // 365 + 1
    return c
