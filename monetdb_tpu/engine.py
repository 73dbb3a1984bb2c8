"""Engine facade: SQL in, rows out — the condensation of the reference's
session scenario (sql/backends/monet5/sql_scenario.c SQLengine: parse →
rel → optimize → codegen → run → export result)."""

from __future__ import annotations

import dataclasses
import datetime
from decimal import Decimal as PyDecimal
from typing import List, Optional, Tuple

import numpy as np

from .dtypes import Kind, SQLType
from .exec import Executor
from .sql.binder import bind_select
from .table import Catalog

__all__ = ["Engine", "Result"]

_EPOCH = datetime.date(1970, 1, 1)


@dataclasses.dataclass
class Result:
    names: List[str]
    types: List[SQLType]
    rows: List[tuple]
    trace: Optional[list] = None   # profiler events when trace=True

    def __len__(self):
        return len(self.rows)

    def show(self, n: int = 20) -> str:
        out = ["\t".join(self.names)]
        for r in self.rows[:n]:
            out.append("\t".join(str(v) for v in r))
        return "\n".join(out)


def _decode_np(raw: np.ndarray, typ, sdict=None) -> list:
    """Physical numpy column -> python values, vectorized (one numpy pass
    per column instead of per-value conversions; the reference's
    mvc_export_table formats per column the same way, sql_result.c:1243)."""
    raw = np.asarray(raw)
    if typ.kind == Kind.STR:
        if sdict is None or len(sdict.values) == 0:
            return [None] * len(raw)
        vals = sdict.values[np.clip(raw, 0, len(sdict.values) - 1)]
        lst = vals.tolist()
        bad = raw < 0
        if bad.any():
            return [None if b else str(v) for b, v in zip(bad.tolist(), lst)]
        return [str(v) for v in lst]
    k = typ.np_dtype.kind
    if k == "f":
        lst = raw.tolist()
        return [None if v != v else v for v in lst]
    if k == "b":
        return raw.astype(bool).tolist()
    nil = int(np.iinfo(typ.np_dtype).min)
    lst = raw.tolist()
    if typ.kind == Kind.DECIMAL:
        s = typ.scale
        return [None if v == nil else PyDecimal(v).scaleb(-s) for v in lst]
    if typ.kind == Kind.DATE:
        dates = raw.astype("datetime64[D]").tolist()
        return [None if v == nil else d for v, d in zip(lst, dates)]
    if typ.kind == Kind.TIMESTAMP:
        ts = raw.astype("datetime64[us]").tolist()
        return [None if v == nil else t for v, t in zip(lst, ts)]
    if typ.kind == Kind.TIME:
        out = []
        for v in lst:
            if v == nil:
                out.append(None)
                continue
            s, us = divmod(v, 1_000_000)
            h, rem = divmod(s, 3600)
            m, sec = divmod(rem, 60)
            out.append(datetime.time(int(h) % 24, int(m), int(sec), int(us)))
        return out
    return [None if v == nil else v for v in lst]


def _decode_column(col) -> list:
    raw = np.asarray(col.data[: col.count])
    return _decode_np(raw, col.typ, col.sdict)


class Engine:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def plan(self, sql: str):
        return bind_select(self.catalog, sql)

    def query(self, sql: str, trace: bool = False) -> Result:
        return self.query_stmt(sql, trace=trace)

    def query_stmt(self, sql_or_stmt, trace: bool = False) -> Result:
        rel, out_cols = bind_select(self.catalog, sql_or_stmt)
        return self.execute_plan(rel, out_cols, trace=trace)

    def execute_plan(self, rel, out_cols, trace: bool = False) -> Result:
        """TRACE mode mirrors the reference's SQLsetTrace
        (sql/backends/monet5/sql_execute.c:61): per-operator events with
        timings, row counts and the chosen kernel algorithm.

        Fast path: the whole plan compiles to ONE fused XLA fragment
        (exec/fragment.py) - a single device dispatch, like the
        reference's compiled MAL program (mal_interpreter.c:491).
        Plans outside the fragment compiler (and TRACE runs, which want
        per-operator events) take the op-at-a-time executor."""
        from . import config as _cfg
        if not trace and bool(_cfg.get("fragment_exec")):
            from .exec.fragment import Unsupported, run_fragment
            from .sql.syscat import CURRENT_QUERY, QUEUE
            try:
                QUEUE.check(CURRENT_QUERY.tag)
                names = [getattr(c, "display", None) or c.name
                         for c in out_cols]
                fr = run_fragment(self.catalog, rel,
                                  [c.name for c in out_cols])
                QUEUE.check(CURRENT_QUERY.tag)
                decoded = [_decode_np(a[:fr.count], pt.typ, pt.sdict)
                           for a, pt in zip(fr.arrays, fr.pts)]
                rows = [tuple(d[i] for d in decoded) for i in range(fr.count)]
                return Result(names, [c.typ for c in out_cols], rows)
            except Unsupported:
                from .exec import fragment as _frag
                _frag.STATS["fallbacks"] += 1
        events = None
        if trace:
            from .obs import PROFILER
            PROFILER.start()
        try:
            frame = Executor(self.catalog).run(rel)
        finally:
            if trace:
                from .obs import PROFILER
                events = PROFILER.stop()
        names = [getattr(c, "display", None) or c.name for c in out_cols]
        cols = [frame.get("#out", c.name) for c in out_cols]
        decoded = [_decode_column(c) for c in cols]
        rows = [tuple(d[i] for d in decoded) for i in range(frame.count)]
        return Result(names, [c.typ for c in out_cols], rows, trace=events)
