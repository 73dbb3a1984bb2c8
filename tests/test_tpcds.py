"""TPC-DS subset parity vs a sqlite oracle — the analog of the
reference's sql/benchmarks/tpcds suite (Tests/one.test.in). The same SQL
text runs on both engines over identical physical-domain arrays; money is
integer cents, so SUMs compare exactly and AVG/ratio floats compare to
1e-9 relative tolerance."""

import math
import sqlite3

import pytest

from monetdb_tpu.bench.tpcds import QUERIES, load_tpcds
from monetdb_tpu.engine import Engine

_N = 25_000


def _oracle(data):
    con = sqlite3.connect(":memory:")
    for tname, cols in data.items():
        names = list(cols)
        con.execute(f"create table {tname} ({', '.join(names)})")
        pyarrs = [[int(v) for v in a] if a.dtype.kind in "iu"
                  else [str(v) for v in a] for a in cols.values()]
        con.executemany(
            f"insert into {tname} values ({','.join('?' * len(names))})",
            list(zip(*pyarrs)))
    return con


_cat = _data = _con = None


def setup_module(module):
    global _cat, _data, _con
    _cat, _data = load_tpcds(_N)
    _con = _oracle(_data)


def _cell_eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) == math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _rows_eq(got, want):
    if len(got) != len(want):
        return False
    return all(len(g) == len(w) and all(_cell_eq(x, y)
                                        for x, y in zip(g, w))
               for g, w in zip(got, want))


@pytest.mark.parametrize("qid", sorted(QUERIES, key=int))
def test_tpcds_query(qid):
    sql = QUERIES[qid]
    got = [tuple(None if v is None else
                 (float(v) if hasattr(v, "scaleb") else v) for v in r)
           for r in Engine(_cat).query(sql).rows]
    want = [tuple(r) for r in _con.execute(sql).fetchall()]
    assert _rows_eq(got, want), \
        f"Q{qid}: {len(got)} vs {len(want)} rows\n" \
        f"got[:3]={got[:3]}\nwant[:3]={want[:3]}"
