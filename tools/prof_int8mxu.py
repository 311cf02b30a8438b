"""Probe: does Mosaic lower s8xs8->s32 dots on this TPU, and at what
throughput vs bf16?  Decides whether the decode deposit's one-hot
scatter matmuls can run int8 (2x MXU rate, half the plane-build bytes).

Usage: python tools/prof_int8mxu.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def make_kernel(dtype, K, reps):
    # mirrors the deposit's real structure: int32 plane source -> astype
    # planes -> dot with the one-hot; the per-rep int32 add defeats CSE
    # and stands in for the per-row masking
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.int32 if dtype != jnp.bfloat16
                        else jnp.float32)
        a = a_ref[...]
        b = b_ref[...].astype(dtype)
        for r in range(reps):
            ar = (a + r).astype(dtype)
            acc = acc + jnp.dot(
                ar, b,
                preferred_element_type=(jnp.float32 if dtype == jnp.bfloat16
                                        else jnp.int32)).astype(acc.dtype)
        o_ref[...] = acc.astype(jnp.int32)

    return kernel


def bench(dtype, K=4096, reps=8, T=64):
    a = jnp.asarray(np.random.randint(0, 100, (128, K)), jnp.int32)
    b = jnp.asarray(np.random.randint(0, 2, (K, 128)), jnp.int32)

    f = pl.pallas_call(
        make_kernel(dtype, K, reps),
        grid=(T,),
        in_specs=[pl.BlockSpec((128, K), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    r = g(a, b)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(a, b)
    np.asarray(r[0, 0])
    dt = (time.perf_counter() - t0) / 10
    macs = 128 * K * 128 * reps * T
    print(f"{dtype.__name__:9s}: {dt*1e3:7.2f}ms  "
          f"{macs/dt/1e12:6.1f} TMAC/s")


if __name__ == "__main__":
    for dt in (jnp.bfloat16, jnp.int8):
        try:
            bench(dt)
        except Exception as e:
            print(f"{dt.__name__}: FAILED {type(e).__name__}: {e}")
