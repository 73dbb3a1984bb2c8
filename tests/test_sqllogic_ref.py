"""Pin the ported reference sqllogictest corpus to its committed ledger
(tests/sqllogic/REF_LEDGER.md): every `pass` file must pass; every
known-fail must still fail (a silent fix or regression flips the ledger
and fails here, keeping claims and code in sync — VERDICT r2 item 10)."""

import os
import re

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(HERE, "sqllogic", "REF_LEDGER.md")


def _ledger():
    out = {}
    if not os.path.exists(LEDGER):
        return out
    for line in open(LEDGER):
        m = re.match(r"\|\s*(\S+\.test)\s*\|\s*(pass|FAIL)\s*\|", line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


ENTRIES = sorted(_ledger().items())


@pytest.mark.parametrize("name,status", ENTRIES,
                         ids=[n for n, _ in ENTRIES])
def test_ref_sqllogic(name, status):
    import sys
    sys.path.insert(0, HERE)
    from gen_ref_ledger import run_one   # shares the chain/prereq logic
    path = os.path.join(HERE, "sqllogic", "ref", name)
    got, n, why = run_one(path)
    if status == "pass":
        assert got == "pass", why
        if n == 0:
            # legitimate only for record-free files (comment-only
            # regression fixtures)
            body = open(path).read()
            assert not any(ln.startswith(("statement", "query"))
                           for ln in body.splitlines()), \
                "runner executed no records for a non-empty file"
    else:
        assert got == "FAIL", "known-fail now passes: update the ledger"
        pytest.skip("known-fail (see REF_LEDGER.md), still failing")


def test_ledger_exists_and_counts():
    led = _ledger()
    assert len(led) >= 50, f"ledger has {len(led)} files, want >= 50"
    npass = sum(1 for s in led.values() if s == "pass")
    assert npass >= 40, f"only {npass} passing reference files"
