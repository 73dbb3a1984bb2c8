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


def _decode_column(col) -> list:
    typ = col.typ
    raw = np.asarray(col.data[: col.count])
    if typ.kind == Kind.STR:
        vals = col.sdict.decode(raw)
        return [None if v is None else str(v) for v in vals]
    if typ.np_dtype.kind == "f":
        return [None if np.isnan(v) else float(v) for v in raw]
    nil = np.iinfo(typ.np_dtype).min if typ.np_dtype.kind == "i" else None
    out = []
    for v in raw:
        v = int(v) if typ.np_dtype.kind == "i" else bool(v)
        if nil is not None and v == nil:
            out.append(None)
        elif typ.kind == Kind.DECIMAL:
            out.append(PyDecimal(v).scaleb(-typ.scale))
        elif typ.kind == Kind.DATE:
            out.append(_EPOCH + datetime.timedelta(days=v))
        elif typ.kind == Kind.TIMESTAMP:
            out.append(datetime.datetime(1970, 1, 1)
                       + datetime.timedelta(microseconds=v))
        elif typ.kind == Kind.TIME:
            s, us = divmod(v, 1_000_000)
            h, rem = divmod(s, 3600)
            m, sec = divmod(rem, 60)
            out.append(datetime.time(int(h) % 24, int(m), int(sec), int(us)))
        else:
            out.append(v)
    return out


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
        timings, row counts and the chosen kernel algorithm."""
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
