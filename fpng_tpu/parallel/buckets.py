"""Padding-bucket policy + autotuner (SURVEY §7 P8).

Mixed-shape corpora trigger one jit compile per distinct padded geometry.
Buckets trade padded-lane waste (dead walk/finish work on every batch)
against compile count.  The ladder is {1, 1+1/d, 1+2/d, ...} x pow2:
density d=1 is plain pow2 (<=50% waste), d=2 caps waste at 33%, d=4 at
20%, and so on.

autotune_density picks d for a corpus from its observed stream lengths
and measured/estimated costs - the corpus-level analog of the reference
picking buffer sizes once per image (fpng.cpp:1684-1688, temp buffer =
exact raster size; we cannot afford exact sizes because each distinct
size costs a TPU compile).
"""

from __future__ import annotations

import math
import os

DEFAULT_DENSITY = 2


def density() -> int:
    """Current ladder density (env override: FPNG_TPU_BUCKET_DENSITY)."""
    try:
        return max(1, int(os.environ.get("FPNG_TPU_BUCKET_DENSITY", "0"))) \
            if os.environ.get("FPNG_TPU_BUCKET_DENSITY") else DEFAULT_DENSITY
    except ValueError:
        return DEFAULT_DENSITY


def bucket(n: int, d: int | None = None, unit: int = 1) -> int:
    """Smallest ladder value >= n, in multiples of `unit`.

    Ladder: {unit, ..} * {1, 1+1/d, ...} * 2^k.  n <= 0 maps to unit.
    """
    d = density() if d is None else d
    g = max(-(-n // unit), 1)
    b = 1
    while True:
        for j in range(d):
            v = b + (b * j) // d
            if (b * j) % d == 0 and g <= v:
                return v * unit
        b *= 2


def waste(lengths, d: int, unit: int = 1) -> float:
    """Mean fractional padding waste of the ladder over `lengths`."""
    tot = pad = 0
    for n in lengths:
        b = bucket(n, d, unit)
        tot += b
        pad += b - -(-n // unit) * unit
    return pad / tot if tot else 0.0


def compile_count(lengths, d: int, unit: int = 1) -> int:
    return len({bucket(n, d, unit) for n in lengths})


def autotune_density(lengths, *, compile_cost_s: float = 20.0,
                     per_unit_cost_s: float = 5e-7, unit: int = 1,
                     repeats: int = 1, densities=(1, 2, 4, 8)) -> int:
    """Pick the ladder density minimizing estimated corpus cost.

    cost(d) = compiles(d) * compile_cost_s
            + repeats * sum(padded_units) * per_unit_cost_s

    compile_cost_s: one TPU jit compile (~20-40 s cold, ~0 cached);
    per_unit_cost_s: marginal cost of one dead padded unit per pass;
    repeats: how many times the corpus will be decoded per compile
    (amortizes compiles for steady-state serving).
    """
    lengths = list(lengths)
    if not lengths:
        return DEFAULT_DENSITY
    best_d, best_cost = DEFAULT_DENSITY, math.inf
    for d in densities:
        padded = sum(bucket(n, d, unit) for n in lengths)
        cost = (compile_count(lengths, d, unit) * compile_cost_s +
                repeats * padded * per_unit_cost_s)
        if cost < best_cost:
            best_d, best_cost = d, cost
    return best_d
