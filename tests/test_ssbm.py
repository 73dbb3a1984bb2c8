"""SSBM (Star Schema Benchmark) parity vs a sqlite oracle — the analog of
the reference's sql/benchmarks/ssbm suite. The same SQL text runs on both
engines over identical physical-domain arrays, so rows compare exactly."""

import sqlite3

import pytest

from monetdb_tpu.bench.ssbm import QUERIES, gen_ssbm, load_ssbm
from monetdb_tpu.engine import Engine

_N = 20_000


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
    _cat, _data = load_ssbm(_N)
    _con = _oracle(_data)


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_ssbm_query(qid):
    sql = QUERIES[qid]
    got = Engine(_cat).query(sql).rows
    want = [tuple(r) for r in _con.execute(sql).fetchall()]
    if "order by" not in sql:
        got, want = sorted(got, key=str), sorted(want, key=str)
    assert got == want, f"Q{qid}: {len(got)} vs {len(want)} rows"
