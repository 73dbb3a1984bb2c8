"""Benchmark: TPC-H hot-path throughput on the real chip.

Headline metric (BASELINE.md north star #1): scan-filter throughput in
GB/s/chip, measured on the fused Q6 fragment (filter over 3 columns +
masked sum) at SF-4-scale row counts. vs_baseline = value / 5.0 (the
≥5 GB/s/chip target).

Measurement method: the kernel repeats K times *on device* via lax.scan
with per-iteration scalar parameters (so XLA cannot collapse iterations),
and throughput comes from the slope between two K values — this cancels
both the host↔device RPC overhead (~20 ms through the axon tunnel) and
any loop-invariant precomputation XLA hoists out of the scan.

Prints the headline JSON line on stdout as soon as the microbenches
finish, then RE-prints it (updated) after every completed engine query —
last line wins.  Round 3 lost all its engine numbers to a driver-window
timeout because the line was only emitted at process end; incremental
emission means whatever completed is recorded no matter when the process
is killed.  Detail goes to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def _timed(fn, *args, reps=5):
    import jax
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        vals.append(time.perf_counter() - t0)
    vals.sort()
    return vals[len(vals) // 2]


def main():
    import monetdb_tpu  # noqa: F401  (enables x64)
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:  # persistent compile cache: repeat bench runs skip cold compiles
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    n = 24_000_000
    rng = np.random.default_rng(7)
    shipdate = jnp.asarray(rng.integers(8035, 10561, n).astype(np.int32))
    disc = jnp.asarray(rng.integers(0, 11, n).astype(np.int64))
    qty = jnp.asarray(rng.integers(100, 5100, n).astype(np.int64))
    extp = jnp.asarray((rng.integers(9000, 2_000_000, n)).astype(np.int32))
    code = jnp.asarray(rng.integers(0, 6, n).astype(np.int32))
    tax = jnp.asarray(rng.integers(0, 9, n).astype(np.int64))
    print(f"devices: {jax.devices()}", file=sys.stderr)

    # ---- Q6 scan-filter: per-iteration HBM traffic ≈ 24 B/row -------------
    @jax.jit
    def q6_loop(shipdate, disc, qty, extp, los, dlos):
        def body(acc, ld):
            lo, dlo = ld
            m = ((shipdate >= lo) & (shipdate < 9131)
                 & (disc >= dlo) & (disc <= 7) & (qty < 2400))
            prod = extp * disc.astype(extp.dtype)
            return acc + jnp.sum(jnp.where(m, prod, 0).astype(jnp.int64)), None
        acc, _ = lax.scan(body, jnp.int64(0), (los, dlos))
        return acc

    def q6_args(k):
        return (shipdate, disc, qty, extp,
                jnp.asarray(8766 + np.arange(k) % 7, jnp.int32),
                jnp.asarray(5 + np.arange(k) % 2, jnp.int64))

    k1, k2 = 4, 36
    jax.device_get(q6_loop(*q6_args(k1)))
    jax.device_get(q6_loop(*q6_args(k2)))
    t1 = _timed(q6_loop, *q6_args(k1))
    t2 = _timed(q6_loop, *q6_args(k2))
    per_iter6 = max((t2 - t1) / (k2 - k1), 1e-9)
    gbs = 24.0 * n / per_iter6 / 1e9
    print(f"q6 scan-filter: {per_iter6*1e3:.3f} ms/iter  {gbs:.1f} GB/s  "
          f"{n/per_iter6/1e6:.0f} Mrows/s (t{k1}={t1*1e3:.1f}ms "
          f"t{k2}={t2*1e3:.1f}ms)", file=sys.stderr)

    # ---- Q1 grouped aggregation: 6 segmented sums over 8 groups -----------
    @functools.partial(jax.jit, static_argnames=("domain",))
    def q1_loop(code, shipdate, qty, extp, disc, tax, cutoffs, *, domain=8):
        one_minus = 100 - disc
        dp = extp.astype(jnp.int64) * one_minus
        ch = dp * (100 + tax)
        ones = jnp.ones_like(qty)

        slots = jax.lax.iota(jnp.int32, domain)[None, :]

        def body(acc, cutoff):
            m = (code >= 0) & (shipdate <= cutoff)
            # one-hot reduction: scatter-add to a tiny domain crashes the
            # v5e worker (s64 scatter); a fused masked broadcast-reduce is
            # the roofline-friendly form for dense group domains
            oh = m[:, None] & (code[:, None] == slots)

            def seg(v):
                return jnp.sum(jnp.where(oh, v[:, None], 0), axis=0)

            parts = seg(qty) + seg(extp.astype(jnp.int64)) + seg(dp) \
                + seg(ch) + seg(disc) + seg(ones)
            return acc + jnp.sum(parts), None

        acc, _ = lax.scan(body, jnp.int64(0), cutoffs)
        return acc

    def q1_args(k):
        return (code, shipdate, qty, extp, disc, tax,
                jnp.asarray(10460 + np.arange(k) % 11, jnp.int32))

    per_iter1 = None
    try:
        j1, j2 = 2, 10
        jax.device_get(q1_loop(*q1_args(j1)))
        jax.device_get(q1_loop(*q1_args(j2)))
        t1q = _timed(q1_loop, *q1_args(j1), reps=3)
        t2q = _timed(q1_loop, *q1_args(j2), reps=3)
        per_iter1 = max((t2q - t1q) / (j2 - j1), 1e-9)
        print(f"q1 group-aggr:  {per_iter1*1e3:.3f} ms/iter  "
              f"{n/per_iter1/1e6:.0f} Mrows/s", file=sys.stderr)
    except Exception as ex:  # keep the headline metric if q1 fails
        print(f"q1 group-aggr failed: {type(ex).__name__}: {str(ex)[:160]}",
              file=sys.stderr)

    # ---- Pallas limb kernel vs the one-hot form (the wired fast path,
    # exec/fragment.py _SegReduce.sum → ops/pallas_kernels.py seg_sum64;
    # VERDICT r3 item 8: show the grouped-aggregate delta) --------------
    pallas_ms = None
    try:
        from monetdb_tpu.ops.pallas_kernels import SEG_SUM_BLOCK, seg_sum64
        np_ = (n // SEG_SUM_BLOCK) * SEG_SUM_BLOCK   # kernel block multiple

        @jax.jit
        def pallas_loop(code, shipdate, qty, extp, disc, tax, cutoffs):
            dp = extp.astype(jnp.int64) * (100 - disc)
            ch = dp * (100 + tax)

            def body(acc, cutoff):
                sid = jnp.where((code >= 0) & (shipdate <= cutoff),
                                code.astype(jnp.int64), jnp.int64(8))
                tot = jnp.int64(0)
                for v in (qty, extp.astype(jnp.int64), dp, ch, disc):
                    s, c = seg_sum64(sid, v, domain=8)
                    tot = tot + jnp.sum(s) + jnp.sum(c)
                return acc + tot, None

            acc, _ = lax.scan(body, jnp.int64(0), cutoffs)
            return acc

        def pallas_args(k):
            return (code[:np_], shipdate[:np_], qty[:np_], extp[:np_],
                    disc[:np_], tax[:np_],
                    jnp.asarray(10460 + np.arange(k) % 11, jnp.int32))

        j1, j2 = 2, 10
        jax.device_get(pallas_loop(*pallas_args(j1)))
        jax.device_get(pallas_loop(*pallas_args(j2)))
        t1p = _timed(pallas_loop, *pallas_args(j1), reps=3)
        t2p = _timed(pallas_loop, *pallas_args(j2), reps=3)
        pallas_ms = max((t2p - t1p) / (j2 - j1), 1e-9) * 1e3
        print(f"q1 pallas limb: {pallas_ms:.3f} ms/iter  "
              f"{n/pallas_ms/1e3:.0f} Mrows/s  "
              f"({per_iter1*1e3/pallas_ms:.1f}x vs one-hot)"
              if per_iter1 else f"q1 pallas limb: {pallas_ms:.3f} ms/iter",
              file=sys.stderr)
    except Exception as ex:
        print(f"q1 pallas bench failed: {type(ex).__name__}: "
              f"{str(ex)[:160]}", file=sys.stderr)

    # ---- join + group-by roofline (BASELINE.json: "within 1.5x of HBM
    # roofline"; reference harness analog monetdb5/modules/kernel/
    # microbenchmark.c).  Roofline = v5e HBM bandwidth (819 GB/s,
    # override MTPU_HBM_ROOFLINE_GBPS).  Bytes accounted per iteration
    # are the algorithm's compulsory HBM traffic, stated inline. -------
    import os as _os
    HBM_GBPS = float(_os.environ.get("MTPU_HBM_ROOFLINE_GBPS", "819"))
    join_gbps = join_frac = None
    try:
        nb, npr = 10_000_000, 100_000_000
        dom = 16_777_216
        rngj = np.random.default_rng(11)
        bkeys = jnp.asarray(rngj.integers(0, dom - 64, nb)
                            .astype(np.int32))
        pkeys = jnp.asarray(rngj.integers(0, dom - 64, npr)
                            .astype(np.int32))

        @jax.jit
        def join_loop(bkeys, pkeys, offs):
            rid = lax.iota(jnp.int32, nb)

            def body(acc, off):
                # dense-build hash-join analog (the engine's join fast
                # path, exec/fragment.py r_join dense strat): scatter-min
                # build table + gather probe
                tmin = jnp.full(dom + 1, jnp.int32(nb), jnp.int32) \
                    .at[bkeys + off].min(rid, mode="drop")
                hit = tmin[jnp.clip(pkeys + off, 0, dom)]
                return acc + jnp.sum(
                    jnp.where(hit < nb, hit, -1).astype(jnp.int64)), None

            acc, _ = lax.scan(body, jnp.int64(0), offs)
            return acc

        def join_args(k):
            return (bkeys, pkeys,
                    jnp.asarray(np.arange(k) % 7, jnp.int32))
        jax.device_get(join_loop(*join_args(1)))
        jax.device_get(join_loop(*join_args(5)))
        tj1 = _timed(join_loop, *join_args(1), reps=3)
        tj2 = _timed(join_loop, *join_args(5), reps=3)
        per_j = max((tj2 - tj1) / 4, 1e-9)
        # compulsory traffic: build keys read (4B*nb) + table write
        # (4B*dom) + probe keys read (4B*npr) + probe gather (4B*npr)
        jbytes = 4.0 * (nb + dom + 2 * npr)
        join_gbps = jbytes / per_j / 1e9
        join_frac = join_gbps / HBM_GBPS
        print(f"join build+probe ({nb/1e6:.0f}M build x {npr/1e6:.0f}M "
              f"probe): {per_j*1e3:.1f} ms/iter  {join_gbps:.1f} GB/s  "
              f"{join_frac:.2f}x of roofline", file=sys.stderr)
    except Exception as ex:
        print(f"join roofline bench failed: {type(ex).__name__}: "
              f"{str(ex)[:160]}", file=sys.stderr)

    gb_gbps = gb_frac = None
    try:
        ngr, nseg = 100_000_000, 1_000_000
        rngg = np.random.default_rng(13)
        sid = jnp.asarray(rngg.integers(0, nseg, ngr).astype(np.int32))
        vals = jnp.asarray(rngg.integers(0, 1000, ngr).astype(np.int32))
        from monetdb_tpu.exec.fragment import _lsd_argsort, _ss

        @jax.jit
        def gb_loop(sid, vals, offs):
            def body(acc, off):
                # high-cardinality grouped sum, engine sorted-reduce
                # path (exec/fragment.py _SegReduce sorted strategy):
                # one LSD sort pass + gather + cumsum + boundary diff
                s = (sid + off) % nseg
                perm = _lsd_argsort([s], ngr)
                ss = s[perm]
                v = vals[perm].astype(jnp.int64)
                c = jnp.concatenate([jnp.zeros(1, jnp.int64),
                                     jnp.cumsum(v)])
                ends = _ss(ss, lax.iota(jnp.int32, nseg), "right")
                starts = jnp.concatenate(
                    [jnp.zeros(1, ends.dtype), ends[:-1]])
                sums = c[ends] - c[starts]
                return acc + jnp.sum(sums), None

            acc, _ = lax.scan(body, jnp.int64(0), offs)
            return acc

        def gb_args(k):
            return (sid, vals, jnp.asarray(np.arange(k) % 5, jnp.int32))
        jax.device_get(gb_loop(*gb_args(1)))
        jax.device_get(gb_loop(*gb_args(3)))
        tg1 = _timed(gb_loop, *gb_args(1), reps=3)
        tg2 = _timed(gb_loop, *gb_args(3), reps=3)
        per_g = max((tg2 - tg1) / 2, 1e-9)
        # compulsory traffic: sid read + sort write-back (2x4B) + perm
        # write (4B) + value gather (4B) + widened cumsum (8B) per row
        gbytes = ngr * 24.0
        gb_gbps = gbytes / per_g / 1e9
        gb_frac = gb_gbps / HBM_GBPS
        print(f"group-by sum ({ngr/1e6:.0f}M rows, {nseg/1e6:.1f}M "
              f"groups): {per_g*1e3:.1f} ms/iter  {gb_gbps:.1f} GB/s  "
              f"{gb_frac:.2f}x of roofline", file=sys.stderr)
    except Exception as ex:
        print(f"group-by roofline bench failed: {type(ex).__name__}: "
              f"{str(ex)[:160]}", file=sys.stderr)

    # ---- whole-query engine wall times, TPC-H SF1, all 22 queries -------
    # (BASELINE.md north-star config 1; measures the full SQL→plan-cache→
    # fused-fragment→result path).  Cold = first run (lower + XLA compile
    # + expansion-capacity discovery); warm = median of 3 repeat runs
    # (plan cache hit, 1-2 RPCs).
    engine_ms = {}
    engine_cold_ms = {}
    skipped = []
    failed = {}

    # measured CPU SQL-engine reference (see BASELINE.md "Measured CPU
    # baseline"): per-query warm wall ms, TPC-H SF1, measured on this
    # machine by monetdb_tpu/bench/cpu_baseline.py.  MonetDB itself cannot
    # be configured here (bison absent, zero egress — see BASELINE.md), so
    # the table records which engine was actually measured.
    cpu_engine, cpu_sf1_ms = _load_cpu_baseline()

    def emit():
        """Print the (current) headline JSON line — called after the
        microbenches and again after every engine query so the newest
        line always reflects everything completed so far."""
        vs_cpu = None
        ncov = 0
        if cpu_sf1_ms and engine_ms:
            ratios = [cpu_sf1_ms[q] / engine_ms[q]
                      for q in engine_ms
                      if engine_ms.get(q) and cpu_sf1_ms.get(q)]
            ncov = len(ratios)
            if ratios:
                vs_cpu = round(_geomean(ratios), 2)
        print(json.dumps({
            "metric": "tpch_sf4_q6_scan_filter_throughput",
            "value": round(gbs, 2),
            "unit": "GB/s/chip",
            "vs_baseline": round(gbs / 5.0, 2),
            "detail": {
                "q6_ms_per_iter": round(per_iter6 * 1e3, 4),
                "q6_mrows_per_s": round(n / per_iter6 / 1e6, 1),
                "q1_ms_per_iter": (round(per_iter1 * 1e3, 4)
                                   if per_iter1 else None),
                "q1_mrows_per_s": (round(n / per_iter1 / 1e6, 1)
                                   if per_iter1 else None),
                "q1_pallas_ms_per_iter": (round(pallas_ms, 4)
                                          if pallas_ms else None),
                "q1_pallas_speedup": (round(per_iter1 * 1e3 / pallas_ms, 2)
                                      if pallas_ms and per_iter1 else None),
                "join_gbps": round(join_gbps, 1) if join_gbps else None,
                "join_roofline_frac": (round(join_frac, 3)
                                       if join_frac else None),
                "groupby_gbps": round(gb_gbps, 1) if gb_gbps else None,
                "groupby_roofline_frac": (round(gb_frac, 3)
                                          if gb_frac else None),
                "hbm_roofline_gbps": HBM_GBPS,
                "engine_sf1_wall_ms": engine_ms or None,
                "engine_sf1_cold_ms": engine_cold_ms or None,
                "engine_sf1_skipped": skipped or None,
                "engine_sf1_failed": failed or None,
                "cpu_baseline_engine": cpu_engine,
                "cpu_baseline_sf1_ms": cpu_sf1_ms or None,
                # geomean over the MEASURED queries; coverage says how
                # many of 22 it includes (r4 verdict: don't overstate)
                "vs_cpu_baseline_geomean": vs_cpu,
                "vs_cpu_baseline_coverage": f"{ncov}/22",
                "rows": n,
            },
        }), flush=True)

    emit()              # microbench headline is on record from here on

    try:
        from monetdb_tpu.bench.tpch_load import load_tpch
        from monetdb_tpu.bench.tpch_queries import QUERIES
        from monetdb_tpu.engine import Engine
        from monetdb_tpu.exec.fragment import STATS
        t0 = time.perf_counter()
        eng = Engine(load_tpch(1.0))
        print(f"SF1 gen+load: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        import os
        # default budget sized to fit the driver window (~30 min total
        # incl. microbenches + SF1 generation; round 3 died at ~31 min)
        budget_s = float(os.environ.get("MTPU_BENCH_BUDGET_S", 900))
        budget_end = time.perf_counter() + budget_s
        # cheapest-first order (round-4 measured cold costs): a budget
        # timeout then drops only the most expensive tail instead of a
        # random suffix
        order = [6, 4, 1, 19, 22, 17, 11, 16, 20, 14, 15, 12, 10, 13,
                 18, 2, 5, 3, 7, 21, 8, 9]
        order += [q for q in sorted(QUERIES) if q not in order]
        for qn in order:
            if qn not in QUERIES:
                continue
            if time.perf_counter() > budget_end:
                skipped.append(qn)      # no silent caps: record the drop
                continue
            sql = QUERIES[qn]
            try:
                t0 = time.perf_counter()
                eng.query(sql)
                engine_cold_ms[f"q{qn}"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    eng.query(sql)
                    reps.append(time.perf_counter() - t0)
                engine_ms[f"q{qn}"] = round(sorted(reps)[1] * 1e3, 1)
                print(f"engine SF1 q{qn}: warm {engine_ms[f'q{qn}']} ms "
                      f"(cold {engine_cold_ms[f'q{qn}']} ms)",
                      file=sys.stderr)
            except Exception as ex:
                print(f"engine SF1 q{qn} failed: {type(ex).__name__}: "
                      f"{str(ex)[:160]}", file=sys.stderr)
                failed[f"q{qn}"] = f"{type(ex).__name__}: {str(ex)[:80]}"
            emit()      # per-query persistence: last line wins
        if skipped:
            print(f"engine SF1 SKIPPED (time budget): {skipped}",
                  file=sys.stderr)
        print(f"engine SF1 wall ms: {engine_ms}", file=sys.stderr)
        print(f"fragment STATS: {STATS}", file=sys.stderr)
    except Exception as ex:
        print(f"engine wall-time bench failed: {type(ex).__name__}: "
              f"{str(ex)[:160]}", file=sys.stderr)

    emit()


def _geomean(xs):
    import math
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def _load_cpu_baseline():
    """Measured CPU SQL-engine per-query times (ms, TPC-H SF1) from
    BASELINE.md's machine-readable table (marker
    `<!-- cpu-sf1-measured engine=NAME -->`), parsed so bench and docs
    cannot drift apart.  Returns (engine_name, {}) if not yet measured."""
    import os
    import re
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    try:
        text = open(path).read()
    except OSError:
        return None, {}
    engine = None
    out = {}
    in_table = False
    for line in text.splitlines():
        m = re.search(r"<!-- cpu-sf1-measured engine=(\S+) -->", line)
        if m:
            engine = m.group(1)
            in_table = True
            continue
        if in_table:
            m = re.match(r"\|\s*q(\d+)\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                out[f"q{m.group(1)}"] = float(m.group(2))
            elif out and line.strip() and not line.startswith("|"):
                break
    return engine, out


if __name__ == "__main__":
    main()
