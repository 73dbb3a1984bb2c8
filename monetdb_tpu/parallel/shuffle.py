"""Distributed shuffle: ragged all-to-all hash-partition exchange over the
device mesh — the feature the reference does NOT have (its remote joins ship
whole columns to one site, modules/mal/remote.c:971 RMTput; SURVEY §2.7
names this the scalability gap the TPU build fills).

Design (static-shape discipline):
  1. counts pass — each shard histograms its rows by destination
     (dest = hash64(key) mod D); one host sync yields the max lane size,
     bucketed into a lane capacity C (the count-then-allocate two-phase
     shape pattern used engine-wide).
  2. pack — stable sort rows by destination, scatter into a [D, C] send
     buffer per column (padding = nil).
  3. exchange — lax.all_to_all over the mesh axis (rides ICI).
  4. unpack — received [D, C] lanes flatten into the local partition with a
     validity mask derived from the exchanged counts.

Skew: the counts pass also reports the max/mean lane ratio; heavy skew
(one hot key) inflates C — detect_skew() surfaces it so callers can widen
capacity or repartition by (key, salt) (full skew-aware two-level
repartitioning is the follow-up milestone).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..column import capacity_for
from .mitosis import AXIS, shard_array

__all__ = ["hash64", "lane_counts", "shuffle", "dist_group_sum",
           "dist_fk_join"]

_MULT = np.int64(-7046029254386353131)       # 0x9E3779B97F4A7C15 as s64


def hash64(key):
    """splitmix-style avalanche; result in [0, 2^62)."""
    h = key * _MULT
    h = h ^ (h >> 31)
    h = h * np.int64(-4417276706812531889)
    return (h ^ (h >> 33)) & np.int64(0x3FFF_FFFF_FFFF_FFFF)


def _dest(key, live, ndev: int):
    return jnp.where(live, (hash64(key) % ndev).astype(jnp.int32), ndev)


def lane_counts(mesh: Mesh, key: jax.Array, live: jax.Array) -> np.ndarray:
    """Counts pass: [D, D] matrix of rows each src shard sends to each dst."""
    D = mesh.devices.size

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS))
    def count(k, lv):
        d = _dest(k, lv, D)
        h = jnp.zeros(D + 1, jnp.int32).at[d].add(1)[:D]
        return h[None, :]

    return np.asarray(count(key, live))


def detect_skew(counts: np.ndarray) -> Tuple[int, float]:
    """(max lane, max/mean ratio) — ratio ≫ 1 means a hot key (Zipf)."""
    mx = int(counts.max())
    mean = float(counts.mean()) or 1.0
    return mx, mx / mean


def shuffle(mesh: Mesh, key: jax.Array, payloads: List[jax.Array],
            live: jax.Array, lane_cap: int):
    """Exchange rows to their hash-owner shard. Returns (key', payloads',
    live') with per-shard local length D·lane_cap."""
    D = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)) + (P(AXIS),) * len(payloads),
        out_specs=(P(AXIS), P(AXIS)) + (P(AXIS),) * len(payloads))
    def run(k, lv, *cols):
        d = _dest(k, lv, D)
        order = jnp.argsort(d, stable=True)
        d_s = d[order]
        cnt = jnp.zeros(D + 1, jnp.int32).at[d].add(1)[:D]
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(cnt)])[:D]
        slot = jax.lax.iota(jnp.int32, d_s.shape[0]) - offs[
            jnp.clip(d_s, 0, D - 1)]
        ok = (d_s < D) & (slot < lane_cap)
        lane = jnp.where(ok, d_s, D - 1)
        pos = jnp.where(ok, slot, lane_cap - 1)

        def pack(col):
            cs = col[order]
            buf = jnp.zeros((D, lane_cap), col.dtype)
            return buf.at[lane, pos].set(
                jnp.where(ok, cs, jnp.zeros((), col.dtype)), mode="drop")

        kbuf = pack(k)
        cbufs = [pack(c) for c in cols]
        cnt_buf = jnp.minimum(cnt, lane_cap).astype(jnp.int32)

        krecv = jax.lax.all_to_all(kbuf[None], AXIS, 1, 0, tiled=False)[:, 0]
        crecv = [jax.lax.all_to_all(b[None], AXIS, 1, 0, tiled=False)[:, 0]
                 for b in cbufs]
        cnt_r = jax.lax.all_to_all(cnt_buf[None, :, None], AXIS, 1, 0,
                                   tiled=False)[:, 0, 0]
        # flatten [D, C] → local rows with validity
        lv_out = (jax.lax.iota(jnp.int32, lane_cap)[None, :]
                  < cnt_r[:, None]).reshape(-1)
        return (krecv.reshape(-1), lv_out,
                *[c.reshape(-1) for c in crecv])

    out = run(key, live, *payloads)
    return out[0], list(out[2:]), out[1]


def dist_group_sum(mesh: Mesh, key: jax.Array, val: jax.Array,
                   live: jax.Array, lane_cap: int):
    """Distributed grouped sum: shuffle by key, then shard-local sort-based
    segmented sum (each key is wholly owned by one shard after exchange —
    the scalable replacement for two-phase aggregation when the group count
    is itself huge)."""
    k2, (v2,), lv2 = shuffle(mesh, key, [val], live, lane_cap)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS),) * 3,
                       out_specs=(P(AXIS),) * 3)
    def local_group(k, v, lv):
        kk = jnp.where(lv, k, jnp.int64(2**62))
        order = jnp.argsort(kk, stable=True)
        ks, vs, ls = kk[order], v[order], lv[order]
        first = (jax.lax.iota(jnp.int32, ks.shape[0]) == 0) | \
            (ks != jnp.roll(ks, 1))
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        n = ks.shape[0]
        sums = jnp.zeros(n, v.dtype).at[seg].add(jnp.where(ls, vs, 0))
        keys_out = jnp.zeros(n, k.dtype).at[seg].set(ks)
        gl = jnp.zeros(n, jnp.bool_).at[seg].max(ls)
        return keys_out, sums, gl

    return local_group(k2, v2, lv2)


def dist_fk_join(mesh: Mesh, lkey, lvals: List[jax.Array], llive,
                 rkey, rvals: List[jax.Array], rlive, lane_cap: int):
    """Distributed FK→PK join: shuffle both sides by key, then shard-local
    probe (right side unique per key). Returns left rows with gathered right
    payloads (miss → live=False), all row-sharded."""
    lk, lvs, ll = shuffle(mesh, lkey, lvals, llive, lane_cap)
    rk, rvs, rl = shuffle(mesh, rkey, rvals, rlive, lane_cap)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS),) * (3 + len(lvs) + len(rvs) + 1),
        out_specs=(P(AXIS),) * (1 + len(lvs) + len(rvs) + 1))
    def probe(lk, ll, rk, rl, *cols):
        nl = len(lvs)
        lcols = cols[:nl]
        rcols = cols[nl:]
        big = jnp.int64(2**62)
        rkk = jnp.where(rl, rk, big)
        order = jnp.argsort(rkk)
        rks = rkk[order]
        pos = jnp.searchsorted(rks, jnp.where(ll, lk, big - 1))
        posc = jnp.clip(pos, 0, rks.shape[0] - 1)
        hit = ll & (rks[posc] == lk)
        src = order[posc]
        out_r = [jnp.where(hit, rc[src], jnp.zeros((), rc.dtype))
                 for rc in rcols]
        return (lk, *lcols, *out_r, hit)

    out = probe(lk, ll, rk, rl, *(list(lvs) + list(rvs)))
    return out[0], list(out[1:-1]), out[-1]
