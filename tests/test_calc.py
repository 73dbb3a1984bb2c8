"""gdk_calc parity: nil propagation, overflow errors, trunc division."""

import numpy as np
import pytest

from monetdb_tpu import Column, I32, I64, F64
from monetdb_tpu.ops import calc as C

NIL32 = np.iinfo(np.int32).min
NIL64 = np.iinfo(np.int64).min
NIL8 = np.iinfo(np.int8).min


def test_add_nil_propagation():
    a = Column.from_numpy(np.array([1, NIL32, 3], np.int32), I32)
    b = Column.from_numpy(np.array([10, 20, NIL32], np.int32), I32)
    r = C.binop("add", a, b)
    assert r.to_numpy().tolist() == [11, NIL32, NIL32]
    assert not r.nonil


def test_add_scalar():
    a = Column.from_numpy(np.array([1, 2, 3], np.int32), I32)
    r = C.binop("add", a, 10)
    assert r.to_numpy().tolist() == [11, 12, 13]


def test_overflow_raises():
    a = Column.from_numpy(np.array([2**31 - 2], np.int32), I32)
    with pytest.raises(C.CalcOverflow):
        C.binop("add", a, a, out_typ=I32)


def test_mul_overflow_int64():
    a = Column.from_numpy(np.array([2**40], np.int64), I64)
    with pytest.raises(C.CalcOverflow):
        C.binop("mul", a, a)


def test_div_by_zero():
    a = Column.from_numpy(np.array([10, 20], np.int32), I32)
    b = Column.from_numpy(np.array([2, 0], np.int32), I32)
    with pytest.raises(C.CalcDivZero):
        C.binop("div", a, b)


def test_trunc_division():
    # C semantics: -7/2 = -3 (not floor -4), -7%2 = -1
    a = Column.from_numpy(np.array([-7, 7], np.int32), I32)
    b = Column.from_numpy(np.array([2, -2], np.int32), I32)
    assert C.binop("div", a, b).to_numpy().tolist() == [-3, -3]
    assert C.binop("mod", a, b).to_numpy().tolist() == [-1, 1]


def test_compare_three_valued():
    a = Column.from_numpy(np.array([1, NIL32, 3], np.int32), I32)
    r = C.compare("<", a, 2)
    assert r.to_numpy().tolist() == [1, NIL8, 0]


def test_ifthenelse():
    cond = C.compare(">", Column.from_numpy(np.array([1, 5, NIL32], np.int32), I32), 2)
    a = Column.from_numpy(np.array([10, 20, 30], np.int32), I32)
    r = C.ifthenelse(cond, a, 0, I32)
    assert r.to_numpy().tolist() == [0, 20, NIL32]


def test_convert_scale():
    from monetdb_tpu.dtypes import decimal
    a = Column.from_numpy(np.array([150, -150, 149], np.int64), decimal(15, 2))
    # rescale 2 → 0 with round half away from zero: 1.50→2, -1.50→-2, 1.49→1
    r = C.convert(a, decimal(15, 0), scale_down=2)
    assert r.to_numpy().tolist() == [2, -2, 1]


def test_float_ops():
    a = Column.from_numpy(np.array([1.5, np.nan, 2.5]), F64)
    r = C.binop("add", a, 1.0)
    out = r.to_numpy()
    assert out[0] == 2.5 and np.isnan(out[1]) and out[2] == 3.5
