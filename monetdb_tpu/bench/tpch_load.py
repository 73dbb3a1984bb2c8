"""Load generated TPC-H numpy tables into engine Columns/Tables.

Plays the role of the reference's COPY INTO + property derivation: on load we
compute the COLrec-style properties (sorted/key/nonil, min/max) that drive
kernel strategy picks — the reference maintains these incrementally in
BATappend (gdk/gdk_batop.c:674); we derive them once per bulk load.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..column import Column
from ..dtypes import DATE, I32, I64, decimal, varchar
from ..table import Catalog, Table
from .tpch_gen import SCHEMA, gen_tpch

__all__ = ["load_tpch", "make_column"]

_TYPES = {
    "i32": I32,
    "i64": I64,
    "dec2": decimal(15, 2),
    "date": DATE,
    "str": varchar(),
}


def make_column(arr: np.ndarray, tag: str) -> Column:
    typ = _TYPES[tag]
    if tag == "str":
        col = Column.from_strings(arr, typ)
        vals = col.to_numpy(decode=False)
    else:
        arr = arr.astype(typ.np_dtype, copy=False)
        col = Column.from_numpy(arr, typ)
        vals = arr
    n = len(vals)
    if n and typ.np_dtype.kind in "iu":
        mn, mx = int(vals.min()), int(vals.max())
        col.minval, col.maxval = mn, mx
        d = np.diff(vals)
        col.sorted = bool((d >= 0).all())
        col.revsorted = bool((d <= 0).all())
        if col.sorted and (d > 0).all():
            col.key = True
        elif mx - mn + 1 == n:
            # dense permutation ⇒ unique (cheap test covers PK columns)
            col.key = bool(len(np.unique(vals)) == n) if n < (1 << 22) else \
                bool((np.bincount(vals - mn, minlength=n) <= 1).all())
    return col


def load_tables(data: Dict[str, Dict[str, np.ndarray]]) -> Catalog:
    cat = Catalog()
    for tname, cols in data.items():
        schema = SCHEMA[tname]
        table = Table.from_dict(
            tname, {c: make_column(v, schema[c]) for c, v in cols.items()})
        cat.add(table)
    return cat


_cache: Dict[float, Catalog] = {}


def load_tpch(sf: float = 0.01, cache: bool = True) -> Catalog:
    if cache and sf in _cache:
        return _cache[sf]
    cat = load_tables(gen_tpch(sf))
    if cache:
        _cache[sf] = cat
    return cat


def load_tpch_db(sf: float = 0.01, data=None):
    """TPC-H loaded into a Database — the SQL *product* path
    (Session/server/embedded), used by the multichip dryrun's 22-query
    Session sweep and by tests that must exercise storage-backed scans.
    Bulk-appends physical arrays directly (COPY INTO's TableData.append
    path, modules/mal/tablet.c role) into an in-memory Database."""
    from ..storage.database import Database
    db = Database()
    if data is None:
        data = gen_tpch(sf)
    for tname, cols in data.items():
        schema = SCHEMA[tname]
        db.create_table(tname, [(c, _TYPES[schema[c]]) for c in cols])
        td = db.tables[tname]
        arrays = {}
        for c, v in cols.items():
            tag = schema[c]
            arrays[c] = v if tag == "str" else \
                v.astype(_TYPES[tag].np_dtype, copy=False)
        td.append(arrays)
    return db
