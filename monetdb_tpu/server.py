"""Network server & client — the reference's listener + client library
condensed (monetdb5/modules/mal/mal_mapi.c SERVERlisten/SERVERlistenThread:
accept loop, thread per client; clients/mapilib/mapi.c: connect/query/fetch;
common/stream/bs.c length-prefixed block framing).

Wire protocol: 4-byte big-endian length + UTF-8 JSON message (the MAPI
block stream re-imagined; a columnar binary result mode is the follow-up,
mirroring mvc_export_table_columnar sql_result.c:1216).

Request:  {"sql": "..."}
Response: {"names": [...], "types": [tags], "rows": [[...]]}   (query)
          {"affected": n}                                      (DML)
          {"ok": true}                                         (DDL/txn)
          {"error": "message"}                                 (failure)

Authentication (enabled when the Database has registered users): on
connect the server sends {"challenge": salt}; the client answers
{"user": u, "digest": sha512(salt + sha512(password))} — the reference's
challenge-response over hashed passwords (monetdb5/mal/mal_authorize.c
AUTHGeneratePasswordHash, common/utils/mcrypt.c; the stored secret is the
password hash, never the password).
"""

from __future__ import annotations

import datetime
import json
import socket
import socketserver
import struct
import threading
from decimal import Decimal as PyDecimal
from typing import List, Optional, Tuple

from .engine import Result
from .session import Session
from .storage import Database
from .storage.columns import tag_type, type_tag

__all__ = ["Server", "Client"]

_LEN = struct.Struct(">I")


def _send(sock: socket.socket, obj) -> None:
    data = json.dumps(obj).encode("utf-8")
    sock.sendall(_LEN.pack(len(data)) + data)


def _recv(sock: socket.socket) -> Optional[dict]:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = _LEN.unpack(hdr)
    data = b""
    while len(data) < n:
        chunk = sock.recv(min(1 << 16, n - len(data)))
        if not chunk:
            return None
        data += chunk
    return json.loads(data.decode("utf-8"))


def _encode_value(v):
    if isinstance(v, PyDecimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _decode_value(v, tag: str):
    if v is None:
        return None
    if tag.startswith("dec:"):
        return PyDecimal(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    return v


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        db = self.server.db
        auth_user = None
        if db.users:
            import os
            salt = os.urandom(16).hex()
            _send(self.request, {"challenge": salt})
            reply = _recv(self.request)
            if reply is None:
                return
            stored = db.users.get(reply.get("user", ""))
            import hashlib
            want = hashlib.sha512(
                (salt + (stored or "")).encode()).hexdigest()
            # constant-time compare (mcrypt.c does the same)
            import hmac
            if stored is None or not hmac.compare_digest(
                    want, reply.get("digest", "")):
                _send(self.request, {"error": "InvalidCredentialsException:"
                                     " auth failed"})
                return
            _send(self.request, {"ok": True})
            auth_user = reply.get("user")
        # session per connection, under the authenticated identity
        # (privileges enforced per sql_privileges.c table_privs)
        session = Session(db, user=auth_user)
        while True:
            try:
                msg = _recv(self.request)
            except (ConnectionError, OSError):
                return
            if msg is None:
                return
            try:
                res = session.sql(msg["sql"])
                if isinstance(res, Result):
                    _send(self.request, {
                        "names": res.names,
                        "types": [type_tag(t) if t is not None else "i64"
                                  for t in res.types],
                        "rows": [[_encode_value(v) for v in r]
                                 for r in res.rows]})
                elif isinstance(res, int):
                    _send(self.request, {"affected": res})
                else:
                    _send(self.request, {"ok": True})
            except Exception as ex:   # error → client, connection survives
                _send(self.request, {"error": f"{type(ex).__name__}: {ex}"})


class _TCP(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class Server:
    """mserver5 analog: owns the Database, accepts clients, one session
    thread per connection."""

    def __init__(self, db: Database, host: str = "127.0.0.1", port: int = 0):
        self.db = db
        self._srv = _TCP((host, port), _Handler)
        self._srv.db = db
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._srv.server_address

    def start(self) -> "Server":
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    @property
    def alive(self) -> bool:
        """Accept loop still running (sabaoth liveness,
        common/utils/msabaoth.h:78-87: the daemon watches this state)."""
        return self._thread is not None and self._thread.is_alive()

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class Client:
    """mapilib analog: blocking query API over the block stream."""

    def __init__(self, host: str, port: int, user: Optional[str] = None,
                 password: Optional[str] = None):
        self.sock = socket.create_connection((host, port))
        if user is not None:
            import hashlib
            ch = _recv(self.sock)
            if ch is None or "challenge" not in ch:
                raise ConnectionError("server did not issue a challenge")
            pwhash = hashlib.sha512((password or "").encode()).hexdigest()
            digest = hashlib.sha512(
                (ch["challenge"] + pwhash).encode()).hexdigest()
            _send(self.sock, {"user": user, "digest": digest})
            resp = _recv(self.sock)
            if resp is None or "error" in resp:
                raise ConnectionError(
                    (resp or {}).get("error", "auth failed"))

    def sql(self, text: str):
        _send(self.sock, {"sql": text})
        resp = _recv(self.sock)
        if resp is None:
            raise ConnectionError("server closed connection")
        if "error" in resp:
            raise RuntimeError(resp["error"])
        if "rows" in resp:
            types = [tag_type(t) for t in resp["types"]]
            rows = [tuple(_decode_value(v, t) for v, t in
                          zip(r, resp["types"]))
                    for r in resp["rows"]]
            return Result(resp["names"], types, rows)
        if "affected" in resp:
            return resp["affected"]
        return None

    def close(self) -> None:
        self.sock.close()
