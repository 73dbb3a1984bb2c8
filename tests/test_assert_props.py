"""GDKdebug-style runtime property assertions (VERDICT r3 item 9).

The reference's `BATassertProps` (gdk/gdk_bat.c), enabled via the
GDKdebug bitmask, validates every BAT's claimed property flags — the
de-facto correctness checker, since a wrong sorted/key/nonil flag makes
BATselect/BATjoin silently pick a wrong fast path.  Our analog is
config `assert_props` (obs/assertprops.py): with it ON a seeded wrong
property fails loudly; with it OFF the same wrong flag silently routes
the join through the dense-PK fetchjoin and returns wrong rows — which
is exactly why the mode exists.
"""

import numpy as np
import pytest

from monetdb_tpu import config
from monetdb_tpu.column import Column
from monetdb_tpu.engine import Engine
from monetdb_tpu.obs.assertprops import (PropertyError, assert_col_props,
                                         assert_frame_props)
from monetdb_tpu.table import Catalog, Table


def _catalog():
    cat = Catalog()
    cat.add(Table.from_dict("t", {
        "k": Column.from_numpy(np.array([3, 1, 2], np.int64)),
        "v": Column.from_numpy(np.array([30, 10, 20], np.int64)),
    }))
    # pk: a genuine dense key 1..3 (fetchjoin-eligible when flagged)
    cat.add(Table.from_dict("pk", {
        "id": Column.from_numpy(np.array([1, 2, 3], np.int64),
                                sorted=True, key=True, minval=1, maxval=3),
        "name": Column.from_strings(np.array(["a", "b", "c"])),
    }))
    return cat


def test_valid_props_pass():
    col = Column.from_numpy(np.array([1, 2, 3], np.int64),
                            sorted=True, key=True, minval=1, maxval=3)
    assert_col_props(col, "ok")


@pytest.mark.parametrize("props,frag", [
    ({"sorted": True}, "sorted"),
    ({"revsorted": True}, "revsorted"),
    ({"key": True}, "duplicates"),
    ({"minval": 5}, "minval"),
    ({"maxval": 1}, "maxval"),
])
def test_wrong_flag_detected(props, frag):
    data = np.array([3, 1, 3], np.int64)
    col = Column.from_numpy(data, **props)
    with pytest.raises(PropertyError, match=frag):
        assert_col_props(col)


def test_wrong_nonil_detected():
    from monetdb_tpu.dtypes import I64
    data = np.array([1, I64.nil, 3], np.int64)
    col = Column.from_numpy(data)
    assert not col.nonil          # auto-detected at construction
    col = col.with_props(nonil=True)
    with pytest.raises(PropertyError, match="nonil"):
        assert_col_props(col)


def test_executor_validates_each_operator():
    """Full-query integration: the op-at-a-time executor checks every
    operator's output frame when the flag is on."""
    cat = _catalog()
    # seed a lie: t.k claims sorted+key though it is 3,1,2
    cat.tables["t"].columns["k"] = \
        cat.tables["t"].columns["k"].with_props(sorted=True, key=True)
    eng = Engine(cat)
    config.set("assert_props", True)
    config.set("fragment_exec", False)
    try:
        with pytest.raises(PropertyError, match="sorted"):
            eng.query("select k, v from t where v > 0")
    finally:
        config.reset("assert_props")
        config.reset("fragment_exec")


def test_seeded_wrong_minval_loud_vs_silent():
    """The motivating scenario: a wrong minval on a dense-PK column makes
    the fetchjoin probe compute positions with the wrong offset.  OFF:
    silently wrong rows.  ON: PropertyError before the join can use it."""
    def build():
        cat = _catalog()
        pk = cat.tables["pk"]
        # lie by one: claims ids start at 2 (actual 1,2,3)
        pk.columns["id"] = pk.columns["id"].with_props(
            sorted=True, key=True, nonil=True, minval=2, maxval=4)
        return Engine(cat)

    sql = ("select t.k, pk.name from t join pk on t.k = pk.id "
           "order by t.k")
    config.set("fragment_exec", False)
    try:
        rows = build().query(sql).rows
        # silently wrong: keys 1..3 probed at offset 2 → shifted names
        assert rows != [(1, "a"), (2, "b"), (3, "c")]

        config.set("assert_props", True)
        with pytest.raises(PropertyError, match="minval"):
            build().query(sql)
    finally:
        config.reset("assert_props")
        config.reset("fragment_exec")


def test_spmd_replication_check_runs():
    """assert_props also turns on the runtime cross-device replication
    assert in the SPMD fragment path (the dynamic version of the
    disabled static vma check, exec/fragment.py _spmd_callable)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from jax.sharding import Mesh
    n = 1 << 13
    rng = np.random.default_rng(0)
    cat = Catalog()
    cat.add(Table.from_dict("big", {
        "g": Column.from_numpy(rng.integers(0, 8, n).astype(np.int64)),
        "x": Column.from_numpy(rng.integers(0, 100, n).astype(np.int64)),
    }))
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    config.set("assert_props", True)
    try:
        eng = Engine(cat, mesh=mesh)
        rows = eng.query(
            "select g, sum(x) from big group by g order by g").rows
        single = Engine(_catalog_copy(cat)).query(
            "select g, sum(x) from big group by g order by g").rows
        assert rows == single
    finally:
        config.reset("assert_props")


def _catalog_copy(cat):
    c2 = Catalog()
    for t in cat.tables.values():
        c2.add(t)
    return c2


def test_frame_hook_names_the_column():
    from monetdb_tpu.exec.executor import Frame
    col = Column.from_numpy(np.array([2, 1], np.int64), sorted=True)
    with pytest.raises(PropertyError, match="t.c"):
        assert_frame_props(Frame({("t", "c"): col}, 2), "Scan")
