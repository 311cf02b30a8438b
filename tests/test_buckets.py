"""Padding-bucket ladder + autotuner (parallel/buckets.py)."""

import numpy as np

from fpng_tpu.parallel.buckets import (autotune_density, bucket,
                                       compile_count, waste)


def test_ladder_pow2():
    assert [bucket(n, 1) for n in (1, 2, 3, 5, 9, 100)] == \
        [1, 2, 4, 8, 16, 128]


def test_ladder_density2_matches_plan_tpu():
    from fpng_tpu.ops.specdec_tpu import LPI, S_TPU, plan_tpu

    for nb in (1, 100, 8192, 65536, 100000, 400000, 652037, 1 << 20):
        nc = -(-nb * 8 // S_TPU)
        assert plan_tpu(nb) == bucket(nc, 2, unit=LPI) >= nc
    # ladder values: 1, 2, 3, 4, 6, 8, 12, ... (x LPI)
    assert [bucket(g, 2) for g in (1, 2, 3, 4, 5, 7, 9, 13)] == \
        [1, 2, 3, 4, 6, 8, 12, 16]


def test_bucket_monotone_and_covering():
    rng = np.random.default_rng(7)
    for d in (1, 2, 4, 8):
        last = 0
        for n in sorted(rng.integers(1, 1 << 20, 200).tolist()):
            b = bucket(n, d)
            assert b >= n
            assert b >= last
            last = b


def test_waste_decreases_with_density():
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 1 << 16, 500).tolist()
    w = [waste(lens, d) for d in (1, 2, 4, 8)]
    assert all(a >= b - 1e-9 for a, b in zip(w, w[1:]))
    assert w[0] <= 0.5 + 1e-9 and w[1] <= 1 / 3 + 1e-9


def test_autotune_tradeoff():
    rng = np.random.default_rng(5)
    lens = rng.integers(1, 1 << 16, 300).tolist()
    # compiles free => pick the densest ladder offered
    assert autotune_density(lens, compile_cost_s=0.0,
                            per_unit_cost_s=1.0) == 8
    # compiles exorbitant => plain pow2
    assert autotune_density(lens, compile_cost_s=1e9,
                            per_unit_cost_s=1e-9) == 1
    # more compiles at higher density
    assert compile_count(lens, 8) >= compile_count(lens, 1)
    assert autotune_density([]) == 2
