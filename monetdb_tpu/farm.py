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
        for name in list(self._servers):
            self.stop(name)

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
                ent = {"name": name,
                       "state": "running" if srv else "stopped"}
                if srv:
                    ent["host"], ent["port"] = srv.address
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
