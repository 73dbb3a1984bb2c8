"""Independent numpy oracle for TPC-H queries over generated data.

Plays the role of the reference's .ans files (sql/benchmarks/tpch/01.ans…):
exact expected rows computed by a deliberately simple, engine-independent
implementation (pure numpy over host arrays, exact integer arithmetic for
decimals). Engine results must match these row-for-row, value-for-value.
"""

from __future__ import annotations

import numpy as np


def _days(s: str) -> int:
    return int((np.datetime64(s) - np.datetime64("1970-01-01")).astype(int))


def q1(data):
    li = data["lineitem"]
    cutoff = _days("1998-12-01") - 90
    m = li["l_shipdate"] <= cutoff
    rf = li["l_returnflag"][m]
    ls = li["l_linestatus"][m]
    qty = li["l_quantity"][m].astype(object)       # exact big ints
    extp = li["l_extendedprice"][m].astype(object)
    disc = li["l_discount"][m].astype(object)
    tax = li["l_tax"][m].astype(object)
    disc_price = extp * (100 - disc)               # scale 4
    charge = disc_price * (100 + tax)              # scale 6
    keys = np.char.add(rf.astype(str), ls.astype(str))
    rows = []
    for k in sorted(set(keys.tolist())):
        g = keys == k
        n = int(g.sum())
        rows.append((
            k[0], k[1],
            int(qty[g].sum()), int(extp[g].sum()),
            int(disc_price[g].sum()), int(charge[g].sum()),
            float((qty[g].sum() / 100) / n * 100 / 100) if False else
            float(qty[g].sum()) / 100.0 / n,
            float(extp[g].sum()) / 100.0 / n,
            float(disc[g].sum()) / 100.0 / n,
            n,
        ))
    return rows


def q6(data):
    li = data["lineitem"]
    lo, hi = _days("1994-01-01"), _days("1995-01-01")
    m = ((li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)
         & (li["l_discount"] >= 5) & (li["l_discount"] <= 7)
         & (li["l_quantity"] < 24 * 100))
    rev = (li["l_extendedprice"][m].astype(object)
           * li["l_discount"][m].astype(object)).sum()
    return [(int(rev),)]
