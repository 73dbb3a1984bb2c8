"""Literal row parity against MonetDB's OWN committed TPC-H answers.

The reference commits `sql/benchmarks/tpch/Tests/one.test.in`: a
sqllogictest that COPYs its shipped SF-0.01 `.tbl` data
(`sql/benchmarks/tpch/SF-0.01/*.tbl`) and pins inline expected results —
full-table scan samples, row counts, and the TPC-H queries, in MonetDB's
own output formatting.  This test runs that file through our sqllogictest
runner against MonetDB's own data files, so every checked value is
byte-compared with what MonetDB itself produces.

Scope note (verified against the tree, not assumed): `lineitem.tbl` is
NOT shipped anywhere in /root/reference — `one.test.in` COPYs
`SF-0.01/lineitem.tbl`, a file only dbgen can produce, so the 17 queries
that read lineitem cannot be oracle-checked from the tree and are covered
by the sqlite oracle instead (tests/test_tpch_sql.py).  What IS fully
checkable — COPY INTO of all 7 shipped `.tbl` files, their scan/count
pins, and TPC-H Q2, Q11, Q13, Q16, Q22 (the lineitem-free queries) —
must pass against MonetDB's answers exactly.

The top-level `01.ans..22.ans` files are the TPC-published SF-1
validation answers (e.g. 01.ans count_order 1478493 = SF-1 cardinality),
not SF-0.01 outputs; they validate dbgen-exact SF-1 data, which no
in-tree artifact provides.  `one.test.in` is the reference's actual
committed oracle for in-tree data and is what this test enforces.
"""

import os
import re

import pytest

REF = "/root/reference/sql/benchmarks/tpch"
TEST_IN = os.path.join(REF, "Tests", "one.test.in")

# statements/queries that need artifacts the reference doesn't ship or
# engine knobs it spells differently; each with the reason it is skipped
_DROP = re.compile(
    r"lineitem"        # SF-0.01/lineitem.tbl absent from the tree
    r"|revenue0"       # Q15 view defined over lineitem
    r"|dict_compress"  # strings/low-card ints are always dict-encoded here
    r"|for_compress",  # (backends/monet5/dict.c/for.c are explicit calls
    re.I)              # in the reference; our encoding is automatic)


def _blocks(text):
    """Split a sqllogictest file into records (blank-line separated)."""
    out, cur = [], []
    for ln in text.split("\n"):
        if ln.strip() == "":
            if cur:
                out.append("\n".join(cur))
                cur = []
        else:
            cur.append(ln)
    if cur:
        out.append("\n".join(cur))
    return out


@pytest.fixture(scope="module")
def prepared():
    text = open(TEST_IN).read().replace("$QTSTSRCBASE", "/root/reference")
    kept, dropped = [], 0
    for b in _blocks(text):
        if _DROP.search(b):
            dropped += 1
        else:
            kept.append(b)
    return kept, dropped


def test_monetdb_committed_answers(prepared):
    """Run the reference's own test file: MonetDB's shipped .tbl data in,
    MonetDB's committed expected values out, byte-compared."""
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage.database import Database
    from monetdb_tpu.testing.sqllogic import SqlLogicRunner

    kept, dropped = prepared
    assert dropped, "expected lineitem blocks to be filtered"
    runner = SqlLogicRunner(Session(Database()))
    n = runner.run_text("\n\n".join(kept), TEST_IN)
    # 7 COPYs + DDL + scan pins + count pins + Q2/Q11/Q13/Q16/Q22
    assert n >= 30, f"only {n} records ran"


def test_lineitem_absent_from_reference_tree():
    """The documented reason 17 queries use the sqlite oracle: the tree
    has no lineitem data (one.test.in:157 COPYs it; dbgen-only)."""
    for root, _dirs, files in os.walk("/root/reference"):
        for f in files:
            assert "lineitem" not in f.lower(), \
                f"lineitem data exists at {root}/{f}; widen the .ans test"
