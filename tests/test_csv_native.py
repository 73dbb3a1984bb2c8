"""Native parallel CSV parser (native/csvparse.cpp, tablet.c analog):
correctness vs the Python path and on a larger randomized file."""

import datetime
from decimal import Decimal

import numpy as np
import pytest

from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database
from monetdb_tpu.storage import csv_native

pytestmark = pytest.mark.skipif(not csv_native.native_available(),
                                reason="g++ toolchain unavailable")


def test_native_matches_python(tmp_path):
    p = tmp_path / "d.csv"
    rows = ["1|12.34|alpha|2020-01-31|-5",
            "2|-0.05|beta gamma|1999-12-31|17",
            "3||NULL|2024-02-29|",
            "4|7|x|2001-07-04|0"]
    p.write_text("\n".join(rows) + "\n")
    ddl = ("create table t (a int, b decimal(9,2), c varchar(20), "
           "d date, e bigint)")

    s1 = Session(Database())
    s1.sql(ddl)
    assert s1.sql(f"copy into t from '{p}'") == 4

    s2 = Session(Database())
    s2.sql(ddl)
    assert s2._copy_python(type("C", (), {
        "table": "t", "path": str(p), "delimiter": "|",
        "records": None})()) == 4

    q = "select a, b, c, d, e from t order by a"
    r1 = s1.sql(q).rows
    r2 = s2.sql(q).rows
    # native keeps empty strings as '' (like MonetDB's COPY default);
    # both paths agree on everything
    assert r1 == r2
    assert r1[0] == (1, Decimal("12.34"), "alpha",
                     datetime.date(2020, 1, 31), -5)
    assert r1[2][1] is None and r1[2][4] is None
    assert r1[2][3] == datetime.date(2024, 2, 29)


def test_native_large_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    n = 50_000
    a = rng.integers(-10**6, 10**6, n)
    b = rng.integers(0, 10**7, n)       # scale-3 decimal
    d = rng.integers(0, 20000, n)       # epoch days
    lines = []
    epoch = datetime.date(1970, 1, 1)
    for i in range(n):
        ds = (epoch + datetime.timedelta(days=int(d[i]))).isoformat()
        lines.append(f"{a[i]}|{b[i]//1000}.{b[i]%1000:03d}|{ds}")
    p = tmp_path / "big.csv"
    p.write_text("\n".join(lines) + "\n")
    s = Session(Database())
    s.sql("create table big (a bigint, b decimal(12,3), d date)")
    assert s.sql(f"copy into big from '{p}'") == n
    r = s.sql("select count(*), sum(a), min(d), max(d) from big").rows[0]
    assert r[0] == n
    assert r[1] == int(a.sum())
    assert r[2] == epoch + datetime.timedelta(days=int(d.min()))
    assert r[3] == epoch + datetime.timedelta(days=int(d.max()))
    rb = s.sql("select sum(b) from big").rows[0][0]
    assert rb == Decimal(int(b.sum())).scaleb(-3)


def test_parse_error_reports_column(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("1|ok\nxx|bad\n")
    s = Session(Database())
    s.sql("create table t (a int, b varchar(5))")
    with pytest.raises(Exception):
        s.sql(f"copy into t from '{p}'")
