"""Database farm daemon — the monetdbd/merovingian analog
(tools/merovingian/daemon/: create/start/stop/snapshot databases in a
dbfarm, status registry, multiplex-funnel).

Differences from the reference, by design: databases run as in-process
Server threads rather than forked mserver processes (the TPU runtime owns
one process per host; isolation comes from per-Database state), so
"supervision" is lifecycle management rather than babysitting PIDs. The
status registry is a JSON file in the farm root (msabaoth's status-file
scheme, common/utils/msabaoth.h:78-87).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from typing import Dict, List, Optional, Tuple

from .server import Client, Server
from .storage import Database

__all__ = ["Farm", "Funnel"]


class Farm:
    """A directory of named databases, each startable as a network server
    (monetdbd's dbfarm; `monetdb create/start/stop/status/snapshot`)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._servers: Dict[str, Server] = {}
        self._dbs: Dict[str, Database] = {}
        self._mu = threading.RLock()
        self._restarts: Dict[str, List[float]] = {}
        self._crashed: Dict[str, bool] = {}
        self._sup_stop: Optional[threading.Event] = None
        self._sup_thread: Optional[threading.Thread] = None

    # -- db lifecycle -----------------------------------------------------
    def _dbdir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad database name {name!r}")
        return os.path.join(self.root, name)

    def create(self, name: str) -> None:
        d = self._dbdir(name)
        if os.path.exists(d):
            raise ValueError(f"database {name} exists")
        db = Database(d)
        db.checkpoint()
        db.close()
        self._write_status()

    def destroy(self, name: str) -> None:
        with self._mu:
            if name in self._servers:
                raise ValueError(f"database {name} is running")
            shutil.rmtree(self._dbdir(name))
            self._dbs.pop(name, None)
        self._write_status()

    def databases(self) -> List[str]:
        return sorted(n for n in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, n))
                      and not n.startswith("."))

    # -- server lifecycle (forkmserver.c analog) --------------------------
    def start(self, name: str, port: int = 0) -> Tuple[str, int]:
        with self._mu:
            if name in self._servers:
                return self._servers[name].address
            if not os.path.isdir(self._dbdir(name)):
                raise ValueError(f"unknown database {name}")
            db = Database(self._dbdir(name))
            srv = Server(db, port=port).start()
            self._dbs[name] = db
            self._servers[name] = srv
            self._write_status()
            return srv.address

    def stop(self, name: str) -> None:
        with self._mu:
            srv = self._servers.pop(name, None)
            if srv is None:
                return
            srv.stop()
            db = self._dbs.pop(name)
            db.checkpoint()
            db.close()
            self._write_status()

    def stop_all(self) -> None:
        self.stop_supervisor()
        for name in list(self._servers):
            self.stop(name)

    # -- supervision (forkmserver.c:189: monetdbd babysits mservers and
    # restarts them on crash; here servers are threads, so "crash" = the
    # accept loop dying, and restart = reopen the Database - which runs
    # WAL replay / manifest recovery - and relisten on the same port) ----
    def supervise(self, interval: float = 0.5, max_restarts: int = 5,
                  window: float = 60.0) -> None:
        """Start the babysitter thread: dead servers are restarted, with
        a crash-loop budget of max_restarts per window seconds (after
        which the database is marked 'crashed' and left down, like
        merovingian giving up on a flapping mserver)."""
        with self._mu:
            if self._sup_thread is not None:
                return
            self._sup_stop = threading.Event()
            self._sup_thread = threading.Thread(
                target=self._sup_loop,
                args=(interval, max_restarts, window), daemon=True)
            self._sup_thread.start()

    def stop_supervisor(self) -> None:
        with self._mu:
            stop, t = self._sup_stop, self._sup_thread
            self._sup_stop = self._sup_thread = None
        if stop is not None:
            stop.set()
            t.join(timeout=5)

    def _sup_loop(self, interval: float, max_restarts: int,
                  window: float) -> None:
        while True:
            stop = self._sup_stop
            if stop is None or stop.wait(interval):
                return
            self.check_once(max_restarts, window)

    def check_once(self, max_restarts: int = 5,
                   window: float = 60.0) -> List[str]:
        """One supervision sweep; returns the names restarted."""
        restarted = []
        with self._mu:
            for name, srv in list(self._servers.items()):
                if srv.alive:
                    continue
                hist = self._restarts.setdefault(name, [])
                now = time.time()
                hist[:] = [t for t in hist if now - t < window]
                host, port = srv.address
                try:
                    srv.stop()
                except Exception:
                    pass
                self._servers.pop(name, None)
                old_db = self._dbs.pop(name, None)
                if old_db is not None:
                    try:
                        old_db.close()
                    except Exception:
                        pass
                if len(hist) >= max_restarts:
                    self._crashed[name] = True   # flapping: give up
                    self._write_status()
                    continue
                hist.append(now)
                db = Database(self._dbdir(name))   # WAL replay recovery
                self._dbs[name] = db
                self._servers[name] = Server(db, host=host,
                                             port=port).start()
                self._crashed.pop(name, None)
                restarted.append(name)
            if restarted:
                self._write_status()
        return restarted

    def db(self, name: str) -> Database:
        """In-process handle of a running database (embedded access)."""
        with self._mu:
            if name not in self._dbs:
                raise ValueError(f"database {name} is not running")
            return self._dbs[name]

    # -- status registry (sabaoth files) ----------------------------------
    def status(self) -> List[dict]:
        out = []
        with self._mu:
            for name in self.databases():
                srv = self._servers.get(name)
                state = "running" if srv else (
                    "crashed" if self._crashed.get(name) else "stopped")
                ent = {"name": name, "state": state}
                if srv:
                    ent["host"], ent["port"] = srv.address
                if self._restarts.get(name):
                    ent["restarts"] = len(self._restarts[name])
                out.append(ent)
        return out

    def _write_status(self) -> None:
        tmp = os.path.join(self.root, ".status.json.new")
        with open(tmp, "w") as f:
            json.dump({"ts": time.time(), "dbs": self.status()}, f)
        os.replace(tmp, os.path.join(self.root, ".status.json"))

    # -- snapshots (daemon/snapshot.c) ------------------------------------
    def snapshot(self, name: str, tar_path: str) -> None:
        with self._mu:
            db = self._dbs.get(name)
            if db is not None:
                db.snapshot(tar_path)
                return
        db = Database(self._dbdir(name))
        try:
            db.snapshot(tar_path)
        finally:
            db.close()

    def restore(self, name: str, tar_path: str) -> None:
        with self._mu:
            if name in self._servers:
                raise ValueError(f"stop {name} before restoring")
            d = self._dbdir(name)
            if os.path.exists(d):
                shutil.rmtree(d)
            Database.restore(tar_path, d).close()
        self._write_status()

    def funnel(self, names: List[str]) -> "Funnel":
        addrs = [self.start(n) for n in names]
        return Funnel(addrs)


class Funnel:
    """Multiplex-funnel (daemon/multiplex-funnel.c): one logical session
    fanned out to N databases; SELECT results are concatenated, DML is
    broadcast and affected-counts summed."""

    def __init__(self, addrs: List[Tuple[str, int]],
                 user: Optional[str] = None,
                 password: Optional[str] = None):
        self.clients = [Client(h, p, user, password) for h, p in addrs]

    def sql(self, text: str):
        from .engine import Result
        results = [c.sql(text) for c in self.clients]
        if all(isinstance(r, Result) for r in results):
            rows = [row for r in results for row in r.rows]
            return Result(results[0].names, results[0].types, rows)
        if all(isinstance(r, int) for r in results):
            return sum(results)
        return None

    def close(self) -> None:
        for c in self.clients:
            c.close()
