"""Microbenchmark generators (microbenchmark.c analog)."""

import numpy as np

from monetdb_tpu.bench.microbench import (normal, skewed, sorted_runs,
                                          uniform, zipf)


def test_uniform():
    c = uniform(10_000, 100, seed=1)
    v = c.to_numpy()
    assert v.min() >= 0 and v.max() < 100
    assert len(np.unique(v)) == 100


def test_zipf_is_skewed():
    c = zipf(50_000, 1000, alpha=1.2, seed=2)
    v = c.to_numpy()
    counts = np.bincount(v, minlength=1000)
    # head dominates: top-10 keys carry far more than uniform share
    assert counts[np.argsort(counts)[-10:]].sum() > 0.25 * len(v)


def test_skewed_mass():
    c = skewed(50_000, 1000, hot_fraction=0.1, hot_mass=0.9, seed=3)
    v = c.to_numpy()
    assert (v < 100).mean() > 0.85


def test_normal_and_runs():
    assert abs(normal(20_000, 5.0, 2.0, seed=4).to_numpy().mean() - 5.0) \
        < 0.1
    c = sorted_runs(1000, 100, seed=5)
    v = c.to_numpy()
    for i in range(0, 1000, 100):
        assert (np.diff(v[i:i + 100]) >= 0).all()
    # deterministic across calls
    assert (uniform(100, 10, seed=7).to_numpy()
            == uniform(100, 10, seed=7).to_numpy()).all()
