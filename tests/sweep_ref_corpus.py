"""Sweep the full reference sqllogictest corpus (/root/reference/sql/test/
**/Tests/*.test, 2223 files) against the engine and record per-file
pass/fail — the scouting tool behind scaling tests/sqllogic/ref/
(VERDICT r3 item 6: 300+ ported files with an honest ledger).

Driver/worker design for crash+hang safety on a 2-CPU box:
  driver:  python tests/sweep_ref_corpus.py [--limit N] [--out LOG]
           spawns a worker, watches the incremental log; if the worker
           dies or stalls (no log write for --stall s), marks the
           in-flight file crash/hang and restarts after it.
  worker:  runs files in-process (one jax import for ~hundreds of
           files), fresh Database per file, signal.alarm per-file cap,
           restarts itself every --chunk files to bound leak growth.

Log format (append-only, one line each, tab-separated):
  START\t<idx>\t<relpath>
  RES\t<idx>\t<relpath>\t<status>\t<n_run>\t<reason>
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF = "/root/reference/sql/test"


def corpus():
    files = sorted(glob.glob(os.path.join(REF, "**", "Tests", "*.test"),
                             recursive=True))
    return files


def relname(path):
    return os.path.relpath(path, REF)


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def run_worker(listfile, out, start, chunk, percap):
    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database
    from monetdb_tpu.testing import SqlLogicRunner

    with open(listfile) as f:
        files = [ln.strip() for ln in f if ln.strip()]
    signal.signal(signal.SIGALRM, _alarm)
    log = open(out, "a", buffering=1)
    end = min(len(files), start + chunk)
    for idx in range(start, end):
        path = files[idx]
        rel = relname(path)
        log.write(f"START\t{idx}\t{rel}\n")
        runner = None
        t0 = time.time()
        try:
            signal.alarm(percap)
            db = Database()
            runner = SqlLogicRunner(Session(db))
            n = runner.run_file(path)
            status, reason = "pass", ""
        except _Timeout:
            status, n = "timeout", runner.n_run if runner else 0
            reason = f"exceeded {percap}s"
        except Exception as ex:  # noqa: BLE001 — sweep records all errors
            status, n = "FAIL", runner.n_run if runner else 0
            reason = f"{type(ex).__name__}: " + \
                str(ex).split("\n")[0][:160].replace("\t", " ")
        finally:
            signal.alarm(0)
        log.write(f"RES\t{idx}\t{rel}\t{status}\t{n}\t{reason}"
                  f"\t{time.time()-t0:.1f}s\n")
    # tell the driver this chunk finished cleanly
    log.write(f"CHUNK_DONE\t{end}\n")


def parse_log(out):
    done = {}
    inflight = None
    last_idx = -1
    if not os.path.exists(out):
        return done, inflight, last_idx
    with open(out) as f:
        for ln in f:
            parts = ln.rstrip("\n").split("\t")
            if parts[0] == "START":
                inflight = (int(parts[1]), parts[2])
            elif parts[0] == "RES":
                idx = int(parts[1])
                done[idx] = parts[2:]
                last_idx = max(last_idx, idx)
                inflight = None
            elif parts[0] == "CHUNK_DONE":
                last_idx = max(last_idx, int(parts[1]) - 1)
                inflight = None
    return done, inflight, last_idx


def run_driver(args):
    if args.files:
        files = [ln.strip() for ln in open(args.files) if ln.strip()]
    else:
        files = corpus()
    if args.limit:
        files = files[: args.limit]
    listfile = args.out + ".list"
    with open(listfile, "w") as f:
        f.write("\n".join(files) + "\n")
    total = len(files)
    while True:
        done, inflight, last_idx = parse_log(args.out)
        if inflight is not None:
            # previous worker died mid-file: record it as a crash
            with open(args.out, "a") as f:
                f.write(f"RES\t{inflight[0]}\t{inflight[1]}\tcrash\t0\t"
                        f"worker died/stalled\t0s\n")
            start = inflight[0] + 1
        else:
            start = last_idx + 1
        if start >= total:
            break
        cmd = [sys.executable, __file__, "--worker", listfile, args.out,
               str(start), str(args.chunk), str(args.percap)]
        p = subprocess.Popen(cmd)
        # watchdog: kill if the log stops moving
        last_size, last_move = -1, time.time()
        while p.poll() is None:
            time.sleep(2)
            sz = os.path.getsize(args.out) if os.path.exists(args.out) else 0
            if sz != last_size:
                last_size, last_move = sz, time.time()
            elif time.time() - last_move > args.stall:
                p.kill()
                p.wait()
                break
    # summary
    done, _, _ = parse_log(args.out)
    by = {}
    for v in done.values():
        by[v[1]] = by.get(v[1], 0) + 1
    print(f"swept {len(done)}/{total}: {by}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=4, metavar=("LIST", "OUT", "START",
                                                  "CHUNK"))
    ap.add_argument("--out", default="/tmp/ref_sweep.log")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--files", default=None,
                    help="path to a file listing test paths to sweep")
    ap.add_argument("--chunk", type=int, default=150)
    ap.add_argument("--percap", type=int, default=45)
    ap.add_argument("--stall", type=int, default=240)
    a, rest = ap.parse_known_args()
    if a.worker:
        lst, out, start, chunk = a.worker
        percap = int(rest[0]) if rest else 45
        run_worker(lst, out, int(start), int(chunk), percap)
    else:
        run_driver(a)


if __name__ == "__main__":
    main()
