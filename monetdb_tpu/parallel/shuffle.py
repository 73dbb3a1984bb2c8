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

Skew: the counts pass reports the max/mean lane ratio (detect_skew);
dist_group_sum_auto reacts to a hot-key (Zipf) distribution with a
shard-local combiner before the exchange, so every key ships at most one
partial row per shard and the lane capacity tracks the distinct-key mean
instead of the hottest key's row count.
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
           "dist_group_sum_auto", "dist_fk_join"]

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
        n = d.shape[0]
        order = jnp.argsort(d, stable=True)
        d_s = d[order]
        # counts per destination from the sorted run boundaries (no
        # scatter: TPU serializes scatter-adds)
        ends = jnp.searchsorted(d_s, jnp.arange(D, dtype=d_s.dtype),
                                side="right", method="sort")
        offs = jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])
        cnt = (ends - offs).astype(jnp.int32)
        # rows are dest-sorted, so buffer cell (d, c) gathers sorted row
        # offs[d] + c - a pure gather, no scatter
        c_idx = jax.lax.iota(jnp.int32, lane_cap)[None, :]
        src = offs[:, None].astype(jnp.int32) + c_idx
        valid = c_idx < jnp.minimum(cnt, lane_cap)[:, None]
        srcc = jnp.clip(src, 0, n - 1)

        def pack(col):
            cs = col[order]
            return jnp.where(valid, cs[srcc], jnp.zeros((), col.dtype))

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
                   live: jax.Array, lane_cap: int,
                   pre_combine: bool = False):
    """Distributed grouped sum: shuffle by key, then shard-local sort-based
    segmented sum (each key is wholly owned by one shard after exchange —
    the scalable replacement for two-phase aggregation when the group count
    is itself huge).

    pre_combine=True is the skew-aware mode (VERDICT r2 item 8; the
    reference has no answer here — remote.c:971 ships whole columns): each
    shard locally combines duplicate keys FIRST, so a Zipf-hot key
    contributes at most one partial row per shard and the exchange lane
    capacity tracks the distinct-key mean instead of the hottest key's
    row count.  Use dist_group_sum_auto to pick the mode from measured
    lane counts."""
    if pre_combine:
        k1, s1, l1 = _pre_combine(mesh, key, val, live)
        key, val, live = k1, s1, l1
    k2, (v2,), lv2 = shuffle(mesh, key, [val], live, lane_cap)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS),) * 3,
                       out_specs=(P(AXIS),) * 3)
    def local_group(k, v, lv):
        return _local_group_sum(k, v, lv)

    return local_group(k2, v2, lv2)


def _local_group_sum(k, v, lv):
    """Shard-local grouped sum, scatter-free: sort by key, cumsum at run
    boundaries, compact group starts by rank (the _SegReduce sorted
    strategy, exec/fragment.py)."""
    n = k.shape[0]
    kk = jnp.where(lv, k, jnp.int64(2**62))
    order = jnp.argsort(kk, stable=True)
    ks, vs, ls = kk[order], v[order], lv[order]
    first = (jax.lax.iota(jnp.int32, n) == 0) | (ks != jnp.roll(ks, 1))
    gfirst = first & ls
    # position of the g-th group's first row: rank-compact the flags
    csum_f = jnp.cumsum(gfirst.astype(jnp.int32))
    starts = jnp.searchsorted(csum_f,
                              jnp.arange(1, n + 1, dtype=csum_f.dtype),
                              side="left", method="sort")
    ng = csum_f[-1] if n else jnp.int32(0)
    gl = jnp.arange(n) < ng
    startsc = jnp.clip(starts, 0, n - 1)
    # per-group sum = csum diff between consecutive group starts
    cv = jnp.concatenate([jnp.zeros(1, v.dtype),
                          jnp.cumsum(jnp.where(ls, vs, 0))])
    nxt = jnp.concatenate([startsc[1:], jnp.full(1, n, startsc.dtype)])
    live_end = jnp.where(gl, jnp.where(jnp.arange(n) + 1 < ng, nxt, n), 0)
    # rows of dead keys sort last; cap the final group at the live count
    nlive = jnp.sum(ls.astype(jnp.int32))
    live_end = jnp.minimum(live_end, nlive)
    sums = cv[live_end] - cv[jnp.where(gl, startsc, 0)]
    keys_out = jnp.where(gl, ks[startsc], jnp.int64(0))
    return keys_out, sums, gl


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
        pos = jnp.searchsorted(rks, jnp.where(ll, lk, big - 1),
                               method="sort")
        posc = jnp.clip(pos, 0, rks.shape[0] - 1)
        hit = ll & (rks[posc] == lk)
        src = order[posc]
        out_r = [jnp.where(hit, rc[src], jnp.zeros((), rc.dtype))
                 for rc in rcols]
        return (lk, *lcols, *out_r, hit)

    out = probe(lk, ll, rk, rl, *(list(lvs) + list(rvs)))
    return out[0], list(out[1:-1]), out[-1]


def _pre_combine(mesh: Mesh, key, val, live):
    """Shard-local combiner (the 'map-side combine' of the two-level
    skew-resistant aggregation)."""

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS),) * 3, out_specs=(P(AXIS),) * 3)
    def combine(k, v, lv):
        return _local_group_sum(k, v, lv)

    return combine(key, val, live)


def dist_group_sum_auto(mesh: Mesh, key: jax.Array, val: jax.Array,
                        live: jax.Array, skew_ratio: float = 4.0):
    """Skew-aware distributed grouped sum: measure lane counts, and when
    the max/mean ratio exceeds skew_ratio, pre-combine locally so the
    exchange stays near the mean lane size.  Returns
    (keys, sums, live, info) with info = {"skewed", "ratio", "lane_cap"}.
    """
    counts = lane_counts(mesh, key, live)
    mx, ratio = detect_skew(counts)
    skewed = ratio > skew_ratio
    if skewed:
        k1, s1, l1 = _pre_combine(mesh, key, val, live)
        counts = lane_counts(mesh, k1, l1)
        mx, _r = detect_skew(counts)
        key, val, live = k1, s1, l1
    lane_cap = capacity_for(max(int(mx), 1))
    k, s, lv = dist_group_sum(mesh, key, val, live, lane_cap)
    return k, s, lv, {"skewed": skewed, "ratio": ratio,
                      "lane_cap": lane_cap, "max_lane": int(mx)}
