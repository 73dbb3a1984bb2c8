"""Run every .test file under tests/sqllogic/ through the sqllogictest
runner (the reference's dominant test format — testing/sqllogictest.py)."""

import glob
import os

import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database
from monetdb_tpu.testing import SqlLogicRunner

FILES = sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                      "sqllogic", "*.test")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f)
                                             for f in FILES])
def test_sqllogic_file(path):
    runner = SqlLogicRunner(Session(Database()))
    n = runner.run_file(path)
    assert n > 0
