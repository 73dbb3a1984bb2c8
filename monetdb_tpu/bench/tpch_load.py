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


def _encode_column(arr: np.ndarray, tag: str) -> dict:
    """Host-side column payload: physical values (dict codes for str) +
    derived COLrec-style property flags.  Pure function of the input -
    disk-cacheable (the round-4 bench spent ~7 min here per run)."""
    typ = _TYPES[tag]
    if tag == "str":
        from ..column import StrDict
        sd, vals = StrDict.encode(np.asarray(arr, dtype=object).astype(str))
        payload = {"data": vals, "dictv": sd.values}
    else:
        vals = arr.astype(typ.np_dtype, copy=False)
        payload = {"data": vals, "dictv": None}
    n = len(vals)
    from ..dtypes import is_nil_np
    if tag == "str":
        nonil = not bool((vals < 0).any())
    else:
        nonil = not bool(is_nil_np(vals, typ).any())
    props = {"sorted": False, "revsorted": False, "key": False,
             "minval": None, "maxval": None, "nonil": nonil}
    if n and typ.np_dtype.kind in "iu":
        mn, mx = int(vals.min()), int(vals.max())
        props["minval"], props["maxval"] = mn, mx
        d = np.diff(vals)
        props["sorted"] = bool((d >= 0).all())
        props["revsorted"] = bool((d <= 0).all())
        if props["sorted"] and (d > 0).all():
            props["key"] = True
        elif mx - mn + 1 == n:
            # dense permutation ⇒ unique (cheap test covers PK columns)
            props["key"] = (bool(len(np.unique(vals)) == n)
                            if n < (1 << 22) else
                            bool((np.bincount(vals - mn,
                                              minlength=n) <= 1).all()))
    payload["props"] = props
    return payload


def _column_of(payload: dict, tag: str) -> Column:
    """Payload -> device Column (pad + device_put only)."""
    from ..column import StrDict
    typ = _TYPES[tag]
    sd = StrDict(payload["dictv"]) if payload["dictv"] is not None else None
    return Column.from_numpy(payload["data"], typ, sdict=sd,
                             **payload["props"])


def make_column(arr: np.ndarray, tag: str) -> Column:
    return _column_of(_encode_column(arr, tag), tag)


def load_tables(data: Dict[str, Dict[str, np.ndarray]]) -> Catalog:
    cat = Catalog()
    for tname, cols in data.items():
        schema = SCHEMA[tname]
        table = Table.from_dict(
            tname, {c: make_column(v, schema[c]) for c, v in cols.items()})
        cat.add(table)
    return cat


_cache: Dict[float, Catalog] = {}

#: encoded-payload disk cache version (bump when _encode_column changes)
_ENC_VER = 1


def _enc_path(sf: float) -> str:
    import os
    import tempfile
    return os.path.join(tempfile.gettempdir(),
                        f"mtpu_tpch_enc_sf{sf}_v{_ENC_VER}.npz")


def _encode_all(sf: float) -> Dict[str, Dict[str, dict]]:
    data = gen_tpch(sf)
    return {t: {c: _encode_column(v, SCHEMA[t][c])
                for c, v in cols.items()}
            for t, cols in data.items()}


def _payloads_save(path: str, enc) -> None:
    import json
    import os
    flat = {}
    meta = {}
    for t, cols in enc.items():
        for c, p in cols.items():
            flat[f"{t}::{c}::data"] = p["data"]
            if p["dictv"] is not None:
                flat[f"{t}::{c}::dict"] = p["dictv"]
            meta[f"{t}::{c}"] = p["props"]
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def _payloads_load(path: str):
    import json
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode())
    enc: Dict[str, Dict[str, dict]] = {}
    for key, props in meta.items():
        t, c = key.split("::", 1)
        enc.setdefault(t, {})[c] = {
            "data": z[f"{t}::{c}::data"],
            "dictv": (z[f"{t}::{c}::dict"]
                      if f"{t}::{c}::dict" in z.files else None),
            "props": props,
        }
    return enc


def load_tpch(sf: float = 0.01, cache: bool = True) -> Catalog:
    """TPC-H catalog at scale factor sf.  Large scale factors cache the
    *encoded* form (dict codes + dictionaries + property flags) on disk:
    re-loading costs one npz read + device transfer instead of the
    ~400 s regeneration + string-dictionary build the round-4 bench paid
    every run (its driver window died in exactly that)."""
    if cache and sf in _cache:
        return _cache[sf]
    import os
    enc = None
    use_disk = cache and sf >= 0.5
    if use_disk and os.path.exists(_enc_path(sf)):
        try:
            enc = _payloads_load(_enc_path(sf))
        except Exception:
            enc = None
    if enc is None:
        enc = _encode_all(sf)
        if use_disk:
            try:
                _payloads_save(_enc_path(sf), enc)
            except Exception:
                pass
    cat = Catalog()
    for tname, cols in enc.items():
        cat.add(Table.from_dict(
            tname, {c: _column_of(p, SCHEMA[tname][c])
                    for c, p in cols.items()}))
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
