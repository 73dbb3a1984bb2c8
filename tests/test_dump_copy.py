"""Dump/restore (msqldump analog) and COPY INTO/BINARY file paths."""

import numpy as np

from monetdb_tpu.dump import dump_sql, restore_sql
from monetdb_tpu.session import Session
from monetdb_tpu.storage import Database


def mk():
    s = Session(Database())
    s.sql("create table t (a int, b decimal(8,2), c varchar(10), d date)")
    s.sql("insert into t values (1, 2.50, 'x', date '2024-01-02'), "
          "(2, null, null, null)")
    return s


def test_dump_restore_roundtrip():
    s = mk()
    s.sql("create view v as select a from t where a > 1")
    s.sql("create function dbl(x int) returns int language python "
          "{ return x * 2 }")
    text = dump_sql(s.db)
    db2 = Database()
    restore_sql(db2, text)
    s2 = Session(db2)
    assert s2.sql("select a, b, c, d from t order by a").rows == \
        s.sql("select a, b, c, d from t order by a").rows
    assert s2.sql("select a from v").rows == [(2,)]
    assert s2.sql("select dbl(a) from t order by a").rows == [(2,), (4,)]


def test_dump_restore_distribution():
    s = Session(Database())
    s.sql("create table p1 (k int)")
    s.sql("create table p2 (k int)")
    s.sql("create merge table m (k int) partition by range on (k)")
    s.sql("alter table m add table p1 as partition from 0 to 9")
    s.sql("alter table m add table p2 as partition from 10 to 19")
    s.sql("insert into m values (5), (15)")
    db2 = Database()
    restore_sql(db2, dump_sql(s.db))
    s2 = Session(db2)
    assert s2.sql("select count(*) from m").rows == [(2,)]
    plan = "\n".join(r[0] for r in
                     s2.sql("explain select k from m where k = 3").rows)
    assert "Scan p1" in plan and "Scan p2" not in plan


def test_copy_into_file(tmp_path):
    s = mk()
    p = str(tmp_path / "out.csv")
    n = s.sql(f"copy t into '{p}'")
    assert n == 2
    lines = open(p).read().splitlines()
    assert lines[0] == "1|2.50|x|2024-01-02"
    assert lines[1] == "2|NULL|NULL|NULL"
    # COPY SELECT ... INTO
    p2 = str(tmp_path / "out2.csv")
    s.sql(f"copy select a from t where a = 1 into '{p2}'")
    assert open(p2).read() == "1\n"


def test_copy_binary(tmp_path):
    s = Session(Database())
    s.sql("create table b (x int, y double, nm varchar(8))")
    xs = np.array([1, 2, 3], np.int32)
    ys = np.array([1.5, 2.5, 3.5], np.float64)
    fx, fy, fn = (str(tmp_path / n) for n in ("x.bin", "y.npy", "nm.txt"))
    xs.tofile(fx)
    np.save(fy, ys)
    open(fn, "w").write("aa\nNULL\ncc\n")
    n = s.sql(f"copy binary into b from ('{fx}', '{fy}', '{fn}')")
    assert n == 3
    r = s.sql("select x, y, nm from b order by x")
    assert r.rows == [(1, 1.5, "aa"), (2, 2.5, None), (3, 3.5, "cc")]


def test_copy_from_compressed(tmp_path):
    """COPY INTO reads gz/bz2/xz transparently (the reference's layered
    compressed streams, common/stream/)."""
    import bz2
    import gzip
    import lzma
    from monetdb_tpu.session import Session
    from monetdb_tpu.storage import Database
    rows = "1|a\n2|b\n3|c\n"
    files = {"t.csv.gz": gzip.compress(rows.encode()),
             "t.csv.bz2": bz2.compress(rows.encode()),
             "t.csv.xz": lzma.compress(rows.encode())}
    s = Session(Database())
    for i, (name, blob) in enumerate(files.items()):
        p = tmp_path / name
        p.write_bytes(blob)
        s.sql(f"create table t{i} (x int, y varchar(5))")
        assert s.sql(f"copy into t{i} from '{p}'") == 3
        assert s.sql(f"select count(*), max(y) from t{i}").rows == \
            [(3, "c")]
