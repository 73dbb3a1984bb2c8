"""SPMD shuffle execution: SQL plans exchange rows through the ragged
all-to-all hash repartition (exec/fragment.py r_repartition) instead of
broadcast-gathering whole build sides / group-by inputs.

This is the distribution feature the reference lacks: its remote joins
ship entire columns to one site (modules/mal/remote.c:971 RMTput; design
note remote.c:13-58).  Tests force low thresholds so tiny data takes the
shuffle path, and assert via fragment STATS that the exchange actually
ran (no silent broadcast fallback)."""

import numpy as np
import pytest

import jax

from monetdb_tpu import config
from monetdb_tpu.engine import Engine, plan_cache_clear
from monetdb_tpu.exec.fragment import STATS
from monetdb_tpu.parallel import row_mesh
from monetdb_tpu.table import Catalog, Table
from monetdb_tpu.storage.columns import column_from_pyvalues
from monetdb_tpu.dtypes import I32, I64, varchar


@pytest.fixture
def shuffle_config():
    """Thresholds low enough that test-size tables shard and shuffle."""
    config.set("spmd_min_shard_rows", 64)
    config.set("spmd_broadcast_rows", 128)
    config.set("spmd_shuffle_min_rows", 64)
    plan_cache_clear()
    yield
    config.reset("spmd_min_shard_rows")
    config.reset("spmd_broadcast_rows")
    config.reset("spmd_shuffle_min_rows")
    plan_cache_clear()


def _mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >1 device")
    return row_mesh(devs)


def _table(name, cols):
    return Table.from_dict(name, {
        n: column_from_pyvalues(list(v), t) for n, (t, v) in cols.items()})


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if abs(x - y) > 1e-9 * max(1.0, abs(x)):
                    return False
            elif x != y:
                return False
    return True


def _parity(cat, sql, want=None):
    """Single-device vs mesh execution parity; returns the STATS delta of
    the mesh run."""
    e1 = Engine(cat)
    a = e1.query(sql)
    em = Engine(cat, mesh=_mesh())
    s0 = dict(STATS)
    b = em.query(sql)
    delta = {k: STATS[k] - s0[k] for k in STATS}
    assert delta["spmd_runs"] >= 1, "plan did not run on the mesh"
    assert _rows_equal(list(a.rows), list(b.rows)), \
        f"SPMD diverged:\n single {list(a.rows)[:5]}\n mesh   {list(b.rows)[:5]}"
    if want is not None:
        assert _rows_equal(list(b.rows), want)
    return delta


def test_shuffle_join_exceeding_broadcast_threshold(shuffle_config):
    """A join whose sharded build side exceeds spmd_broadcast_rows must
    hash-repartition both sides (lane exchange), not gather."""
    rng = np.random.default_rng(5)
    n_fact, n_dim = 4096, 1024           # dim cap 1024 > broadcast 128
    fk = rng.integers(0, n_dim, n_fact)
    amt = rng.integers(1, 100, n_fact)
    cat = Catalog()
    cat.add(_table("fact", {"fk": (I64, fk.tolist()),
                            "amt": (I64, amt.tolist())}))
    cat.add(_table("dim", {"id": (I64, list(range(n_dim))),
                           "grp": (I64, [i % 7 for i in range(n_dim)])}))
    d = _parity(cat, "select d.grp, sum(f.amt) from fact f, dim d "
                     "where f.fk = d.id group by d.grp order by d.grp")
    assert d["shuffle_joins"] >= 1, f"join did not shuffle: {d}"


def test_shuffle_groupby_high_cardinality(shuffle_config):
    """A 10k-distinct group-by over sharded rows routes through the
    key-hash repartition, not a gather barrier."""
    rng = np.random.default_rng(7)
    n = 1 << 15
    keys = rng.integers(0, 10_000, n) * 1_000_003   # sparse: sort strategy
    vals = rng.integers(1, 50, n)
    cat = Catalog()
    cat.add(_table("t", {"k": (I64, keys.tolist()),
                         "v": (I64, vals.tolist())}))
    d = _parity(cat, "select k, sum(v), count(*), min(v), max(v) "
                     "from t group by k order by k limit 50")
    assert d["shuffle_groupbys"] >= 1, f"group-by did not shuffle: {d}"


def test_shuffle_distinct(shuffle_config):
    rng = np.random.default_rng(9)
    n = 1 << 14
    keys = (rng.integers(0, 5_000, n) * 2_000_003).tolist()
    cat = Catalog()
    cat.add(_table("t", {"k": (I64, keys)}))
    d = _parity(cat, "select distinct k from t order by k limit 40")
    assert d["shuffle_distincts"] >= 1, f"distinct did not shuffle: {d}"


def test_shuffle_lane_overflow_retries(shuffle_config):
    """Extreme skew: every row hashes to ONE destination shard, so the
    first lane capacity guess overflows; the host must retry with the
    measured lane and still produce exact results."""
    n = 1 << 14
    keys = [42] * n                      # one hot key -> one dest lane
    vals = list(range(n))
    cat = Catalog()
    cat.add(_table("t", {"k": (I64, keys), "v": (I64, vals)}))
    r0 = STATS["cap_retries"]
    d = _parity(cat, "select k * 7, sum(v) from t group by k * 7",
                want=[(294, n * (n - 1) // 2)])
    assert d["shuffle_groupbys"] >= 1
    assert STATS["cap_retries"] > r0, "skewed lanes should have retried"


def test_shuffle_left_and_semi_joins(shuffle_config):
    """Probe rows with no match and nil keys survive a shuffled left
    join; semi/anti keep probe-side multiplicity."""
    n_dim = 512
    cat = Catalog()
    lk = [i % (2 * n_dim) if i % 5 else None for i in range(4096)]
    cat.add(_table("l", {"k": (I64, lk),
                         "v": (I64, list(range(4096)))}))
    cat.add(_table("r", {"id": (I64, list(range(n_dim))),
                         "w": (I64, [i * 10 for i in range(n_dim)])}))
    d = _parity(cat, "select count(*), sum(r.w), sum(l.v) from l "
                     "left join r on l.k = r.id")
    assert d["shuffle_joins"] >= 1
    d2 = _parity(cat, "select count(*) from l where k in "
                      "(select id from r)")
    assert d2["spmd_runs"] >= 1


def test_broadcast_still_used_for_small_builds(shuffle_config):
    """Builds at or below spmd_broadcast_rows broadcast (no lane
    exchange): the cost pick, not shuffle-always."""
    cat = Catalog()
    cat.add(_table("fact", {"fk": (I64, [i % 64 for i in range(4096)]),
                            "amt": (I64, [1] * 4096)}))
    cat.add(_table("dim", {"id": (I64, list(range(64))),
                           "grp": (I64, [i % 3 for i in range(64)])}))
    d = _parity(cat, "select d.grp, sum(f.amt) from fact f, dim d "
                     "where f.fk = d.id group by d.grp order by d.grp")
    assert d["shuffle_joins"] == 0, f"small build should broadcast: {d}"


def test_shuffle_string_keys(shuffle_config):
    """Dictionary-coded string join keys repartition consistently across
    sides (codes aligned by _align_str)."""
    names = [f"name{i:05d}" for i in range(1024)]
    cat = Catalog()
    rng = np.random.default_rng(3)
    picks = rng.integers(0, 1024, 4096)
    cat.add(_table("f", {"nm": (varchar(12), [names[i] for i in picks]),
                         "x": (I64, list(range(4096)))}))
    cat.add(_table("d", {"nm": (varchar(12), names),
                         "y": (I64, list(range(1024)))}))
    dd = _parity(cat, "select count(*), sum(f.x + d.y) from f, d "
                      "where f.nm = d.nm")
    assert dd["shuffle_joins"] >= 1


def test_tpch_subset_forced_shuffle(shuffle_config):
    """End-to-end: join-heavy TPC-H queries at tiny SF run shuffled with
    exact parity vs single-device (the full 22-query sweep runs in
    __graft_entry__.dryrun_multichip)."""
    from monetdb_tpu.bench.tpch_gen import gen_tpch
    from monetdb_tpu.bench.tpch_load import load_tables
    from monetdb_tpu.bench.tpch_queries import QUERIES

    cat = load_tables(gen_tpch(0.002))
    shuffled = 0
    for q in (3, 10, 13, 18, 21):
        d = _parity(cat, QUERIES[q])
        shuffled += d["shuffle_joins"] + d["shuffle_groupbys"]
    assert shuffled >= 5, f"expected shuffle execution, got {shuffled}"
