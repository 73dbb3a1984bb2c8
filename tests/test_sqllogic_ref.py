"""Pin the ported reference sqllogictest corpus to its committed ledger
(tests/sqllogic/REF_LEDGER.md): every `pass` file must pass; every
known-fail must still fail (a silent fix or regression flips the ledger
and fails here, keeping claims and code in sync).

The 847 files run in BATCHES, each batch in a fresh subprocess: XLA's
CPU JIT segfaults after ~900 compiled programs in one long-lived
process (jax compiler backend_compile_and_load), so a single-process
parametrized run would crash the whole suite around 60%.  Per-file
results still diff against the ledger row by row.
"""

import json
import os
import re
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(HERE, "sqllogic", "REF_LEDGER.md")
BATCH = 60


def _ledger():
    out = {}
    if not os.path.exists(LEDGER):
        return out
    for line in open(LEDGER):
        m = re.match(r"\|\s*(\S+\.test)\s*\|\s*(pass|FAIL)\s*\|", line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


_LED = _ledger()
_NAMES = sorted(_LED)
_BATCHES = [_NAMES[i:i + BATCH] for i in range(0, len(_NAMES), BATCH)]

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from gen_ref_ledger import run_one
out = {{}}
for name in json.load(open(sys.argv[1])):
    st, n, why = run_one({ref!r} + "/" + name)
    out[name] = [st, n, why[:160]]
json.dump(out, open(sys.argv[2], "w"))
"""


@pytest.mark.parametrize("batch_no", range(len(_BATCHES)),
                         ids=[f"batch{i:02d}" for i in
                              range(len(_BATCHES))])
def test_ref_sqllogic_batch(batch_no, tmp_path):
    names = _BATCHES[batch_no]
    inp = tmp_path / "names.json"
    outp = tmp_path / "res.json"
    inp.write_text(json.dumps(names))
    script = _WORKER.format(repo=os.path.dirname(HERE), tests=HERE,
                            ref=os.path.join(HERE, "sqllogic", "ref"))
    env = dict(os.environ)
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run([sys.executable, "-c", script, str(inp),
                        str(outp)], env=env, capture_output=True,
                       text=True, timeout=1200)
    assert p.returncode == 0, f"worker died: {p.stderr[-800:]}"
    res = json.loads(outp.read_text())
    problems = []
    for name in names:
        status = _LED[name]
        got, n, why = res.get(name, ("missing", 0, ""))
        if status == "pass":
            if got != "pass":
                problems.append(f"{name}: expected pass, got {got}: {why}")
            elif n == 0:
                body = open(os.path.join(HERE, "sqllogic", "ref",
                                         name)).read()
                if any(ln.startswith(("statement", "query"))
                       for ln in body.splitlines()):
                    problems.append(f"{name}: ran no records")
        else:
            if got != "FAIL":
                problems.append(
                    f"{name}: known-fail now passes - update the ledger")
    assert not problems, "\n".join(problems[:12])


def test_ledger_exists_and_counts():
    led = _ledger()
    assert len(led) >= 300, f"ledger has {len(led)} files, want >= 300"
    npass = sum(1 for s in led.values() if s == "pass")
    assert npass >= 270, f"only {npass} passing reference files"
    assert npass / len(led) >= 0.9, "ledger pass rate below 90%"
