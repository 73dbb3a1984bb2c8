"""Projection / positional gather — the reference's BATproject family
(gdk/gdk_project.c:857 BATproject, :590 BATproject2, :880 BATprojectchain).

``project(oids, col)`` returns ``col[oids[i]]`` for each live oid; dead slots
(padding, oid == -1) map to the type's nil. Chains of projections collapse to
one gather of composed indices (the opt_projectionpath analog,
monetdb5/optimizer/opt_projectionpath.c) via :func:`project_chain`.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..column import Cand, Column, valid_mask
from .select import materialize

__all__ = ["project", "project_oids", "project_chain"]


@functools.partial(jax.jit, static_argnames=("is_float",))
def _gather(oids, oid_count, values, nil, *, is_float: bool):
    cap_out = oids.shape[0]
    live = valid_mask(cap_out, oid_count) & (oids >= 0)
    safe = jnp.where(live, oids, 0)
    out = values[safe]
    return jnp.where(live, out, nil)


def project_oids(oids: jax.Array, oid_count: int, col: Column) -> Column:
    nil = col.typ.nil if col.typ.np_dtype.kind != "b" else False
    data = _gather(oids, jnp.int64(oid_count), col.data,
                   col.typ.np_dtype.type(nil),
                   is_float=col.typ.np_dtype.kind == "f")
    return Column(col.typ, data, oid_count, nonil=col.nonil,
                  sdict=col.sdict, key=False)


def project(cand_or_oids, col: Column) -> Column:
    """BATproject: gather col rows selected by a candidate (materializes the
    candidate if needed — one host sync, like the reference's result BAT)."""
    if isinstance(cand_or_oids, Cand):
        c = materialize(cand_or_oids, col.cap)
        out = project_oids(c.oids, c.oid_count, col)
        # a projection through sorted candidates preserves sortedness
        if col.sorted:
            out = out.with_props(sorted=True)
        if col.revsorted:
            out = out.with_props(revsorted=True)
        return out
    oids, n = cand_or_oids
    return project_oids(oids, n, col)


@functools.partial(jax.jit, static_argnames=())
def _compose(o1, n1, o2):
    """o_out[i] = o2[o1[i]] with -1 propagation."""
    live = valid_mask(o1.shape[0], n1) & (o1 >= 0)
    safe = jnp.where(live, o1, 0)
    nxt = o2[safe]
    return jnp.where(live, nxt, -1)


def project_chain(oid_list: Sequence, col: Column) -> Column:
    """BATprojectchain: fold [(oids, count), ...] then gather once."""
    (o, n) = oid_list[0]
    for (o2, _n2) in oid_list[1:]:
        o = _compose(o, jnp.int64(n), o2)
    return project_oids(o, n, col)
