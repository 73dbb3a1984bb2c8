"""Explicit window frames: ROWS/RANGE/GROUPS BETWEEN n PRECEDING AND m
FOLLOWING (reference: gdk/gdk_analytic_bounds.c GDKanalyticalwindowbounds +
framed aggregates in gdk_analytic_statistics.c). Oracle: brute-force
Python evaluation of the frame definition."""

import numpy as np
import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk(rows):
    s = Session(Database())
    s.sql("create table w (g int, o int, v int)")
    vals = ", ".join(f"({g},{o},{v if v is not None else 'null'})"
                     for g, o, v in rows)
    s.sql(f"insert into w values {vals}")
    return s


ROWS = [(1, 1, 10), (1, 2, 20), (1, 3, None), (1, 5, 40), (1, 9, 50),
        (2, 1, 5), (2, 4, 6), (2, 6, 7)]


def oracle(rows, func, unit, lo, hi):
    """Brute-force frame evaluation per row (rows sorted by (g, o))."""
    out = []
    srt = sorted(rows, key=lambda r: (r[0], r[1]))
    for i, (g, o, _v) in enumerate(srt):
        part = [(j, r) for j, r in enumerate(srt) if r[0] == g]
        if unit == "rows":
            frame = [r for j, r in part
                     if (lo is None or j >= i + lo) and
                        (hi is None or j <= i + hi)]
        elif unit == "range":
            frame = [r for _j, r in part
                     if (lo is None or r[1] >= o + lo) and
                        (hi is None or r[1] <= o + hi)]
        else:  # groups: o values are distinct here ⇒ groups == peers
            gvals = sorted({r[1] for _j, r in part})
            gi = gvals.index(o)
            ok = [gv for k, gv in enumerate(gvals)
                  if (lo is None or k >= gi + lo) and
                     (hi is None or k <= gi + hi)]
            frame = [r for _j, r in part if r[1] in ok]
        vs = [r[2] for r in frame if r[2] is not None]
        if func == "count":
            out.append(len(vs))
        elif not vs:
            out.append(None)
        elif func == "sum":
            out.append(sum(vs))
        elif func == "min":
            out.append(min(vs))
        elif func == "max":
            out.append(max(vs))
        elif func == "avg":
            out.append(sum(vs) / len(vs))
    return out


def frame_sql(unit, lo, hi):
    def b(x, side):
        if x is None:
            return f"unbounded {side}"
        if x == 0:
            return "current row"
        return f"{-x} preceding" if x < 0 else f"{x} following"
    return f"{unit} between {b(lo, 'preceding')} and {b(hi, 'following')}"


CASES = [
    ("sum", "rows", -1, 1), ("sum", "rows", -2, 0), ("sum", "rows", None, 1),
    ("sum", "rows", 1, None), ("count", "rows", -1, 1),
    ("min", "rows", -1, 1), ("max", "rows", -2, 2),
    ("avg", "rows", -1, 0),
    ("sum", "range", -2, 2), ("sum", "range", -1, 0),
    ("min", "range", -3, 3), ("max", "range", None, 0),
    ("count", "range", -2, 0),
    ("sum", "groups", -1, 1), ("max", "groups", -1, 0),
]


@pytest.mark.parametrize("func,unit,lo,hi", CASES)
def test_framed_agg(func, unit, lo, hi):
    s = mk(ROWS)
    fs = frame_sql(unit, lo, hi)
    r = s.sql(f"select {func}(v) over (partition by g order by o {fs}) "
              f"from w order by g, o")
    got = [x[0] for x in r.rows]
    exp = oracle(ROWS, func, unit, lo, hi)
    if func == "avg":
        assert all((a is None) == (b is None) or
                   abs(a - b) < 1e-9 for a, b in zip(got, exp)), (got, exp)
        got = [None if g is None else round(g, 9) for g in got]
        exp = [None if e is None else round(e, 9) for e in exp]
    assert got == exp, (got, exp, fs)


def test_range_desc():
    s = mk(ROWS)
    r = s.sql("select sum(v) over (partition by g order by o desc "
              "range between 2 preceding and 2 following) "
              "from w order by g, o")
    got = [x[0] for x in r.rows]
    # desc order flips nothing for symmetric bounds
    exp = oracle(ROWS, "sum", "range", -2, 2)
    assert got == exp


def test_range_desc_asymmetric():
    s = mk(ROWS)
    r = s.sql("select sum(v) over (partition by g order by o desc "
              "range between 1 preceding and 0 following) "
              "from w order by g, o")
    got = [x[0] for x in r.rows]
    # '1 preceding' under DESC = o values up to 1 LARGER than current
    exp = oracle(ROWS, "sum", "range", 0, 1)
    assert got == exp


def test_rows_no_partition():
    s = mk(ROWS)
    r = s.sql("select sum(v) over (order by g, o "
              "rows between 1 preceding and current row) "
              "from w order by g, o")
    got = [x[0] for x in r.rows]
    srt = sorted(ROWS, key=lambda t: (t[0], t[1]))
    exp = []
    for i in range(len(srt)):
        vs = [srt[j][2] for j in (i - 1, i)
              if 0 <= j and srt[j][2] is not None]
        exp.append(sum(vs) if vs else None)
    assert got == exp
