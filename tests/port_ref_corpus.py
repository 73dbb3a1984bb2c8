"""Port reference sqllogictests into tests/sqllogic/ref/ from a sweep
log (tests/sweep_ref_corpus.py output): copy every file the sweep
recorded as `pass` verbatim (test *data* fixtures, see PROVENANCE.md)
and regenerate REF_LEDGER.md from the sweep results.

Naming: `<suite>__<name>.test` where suite = the path up to /Tests/
with '/' → '__' (matches the existing convention).

Usage: python tests/port_ref_corpus.py /tmp/ref_sweep3.log
"""

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/sql/test"
DEST = os.path.join(HERE, "sqllogic", "ref")


def ported_name(rel: str) -> str:
    suite, _, name = rel.rpartition("/Tests/")
    if not suite:                      # root-level Tests/ dir
        assert rel.startswith("Tests/"), rel
        return "Tests__" + rel[len("Tests/"):]
    return suite.replace("/", "__") + "__" + name


def main(log_path: str) -> None:
    results = {}
    with open(log_path) as f:
        for ln in f:
            p = ln.rstrip("\n").split("\t")
            if p[0] == "RES":
                results[p[2]] = (p[3], p[5] if len(p) > 5 else "")
    existing = set(os.listdir(DEST))
    copied = 0
    ledger = {}
    # keep every already-ported file (incl. curated known-fails/chains)
    for rel, (status, reason) in sorted(results.items()):
        name = ported_name(rel)
        if status == "pass":
            src = os.path.join(REF, rel)
            dst = os.path.join(DEST, name)
            if name not in existing:
                shutil.copyfile(src, dst)
                copied += 1
            ledger[name] = ("pass", reason)
        elif name in existing:
            if status == "FAIL":
                ledger[name] = ("FAIL", reason)
            else:
                # timeout/crash files cannot be pinned safely (a hang
                # would stall the suite): drop them from the corpus
                os.remove(os.path.join(DEST, name))
    # files present on disk but absent from the sweep results (e.g.
    # chains) keep their prior ledger entry
    print(f"copied {copied} new files; ledger entries {len(ledger)}")
    # merge with prior ledger rows for files not in this sweep
    prior = {}
    led_path = os.path.join(HERE, "sqllogic", "REF_LEDGER.md")
    if os.path.exists(led_path):
        for ln in open(led_path):
            if ln.startswith("| ") and ln.count("|") >= 4:
                cells = [c.strip() for c in ln.strip().strip("|").split("|")]
                if cells[0].endswith(".test"):
                    prior[cells[0]] = (cells[1], cells[3])
    for name in sorted(set(os.listdir(DEST)) - set(ledger)):
        if name.endswith(".test") and name in prior:
            ledger[name] = prior[name]
    n_pass = sum(1 for s, _r in ledger.values() if s == "pass")
    with open(led_path, "w") as f:
        f.write(
            "# Reference sqllogictest ledger (machine-generated)\n\n"
            "Regenerate with `python tests/gen_ref_ledger.py` (re-runs\n"
            "every file) or `python tests/port_ref_corpus.py <sweeplog>`\n"
            "(ports + records a sweep).  The pytest runner\n"
            "(tests/test_sqllogic_ref.py) pins every row: `pass` files\n"
            "must pass; known-fails must still fail.\n\n"
            f"**{len(ledger)} files, {n_pass} pass, "
            f"{len(ledger) - n_pass} known-fail** "
            f"(reference corpus: 2223 files).\n\n"
            "| file | status | n | reason |\n|---|---|---|---|\n")
        for name in sorted(ledger):
            status, reason = ledger[name]
            f.write(f"| {name} | {status} |  | {reason[:100]} |\n")
    print(f"ledger: {len(ledger)} files, {n_pass} pass")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_sweep3.log")
