"""Scratch: split the deposit's one-hot build vs matmul cost on TPU.

The deposit ablation (FPNG_TPU_DEP_ABL=nomxu) shows ~15ms of the 25ms
deposit (32x512x512x3, N=1.18M/img) is the ohc build + i8 dot.  This
probe mimics the deposit's per-walk shapes in a standalone kernel and
times each component chained, to pick the right lever.  The big (plane)
operand rides a per-batch constant block (index map constant in t) so
its DMA does not pollute the measurement.
"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tools.profile_kernels import chain

B, T, WPS = 32, 18, 4          # batches, grid steps, walks per step
GROUP = 4096
M = 136                        # wrows(17) * Pp(8)
MODE = os.environ.get("MODE", "all")  # full|ohc|dot|dotbf16|none|all


def make_kernel(mode):
    def kernel(cu_ref, big_ref, ohc_ref, out_ref):
        acc = jnp.zeros((8, 128), jnp.int32)
        cols128 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
        for k in range(WPS):
            # mirror the real kernel's dataflow: slot arithmetic between
            # the block reshape and the one-hot broadcast
            m_ = cu_ref[0, 0, 32 * k:32 * (k + 1), :].reshape(GROUP)
            offs = m_ << 4
            word = offs >> 5
            wl_m = jnp.where(word >= 0, word, -1)
            c_u = jnp.where(wl_m >= 0, wl_m & 127, -1)
            if mode in ("full", "ohc"):
                ohc = jnp.where(cols128 == c_u[:, None], 1, 0) \
                    .astype(jnp.int8)
            elif mode == "fulli8cmp":
                ohc = (cols128 == c_u[:, None]).astype(jnp.int8)
            elif mode == "fullbf16":
                ohc = (cols128 == c_u[:, None]).astype(jnp.bfloat16)
            else:
                ohc = ohc_ref[0]
            if mode in ("full", "dot", "fulli8cmp"):
                r = jnp.dot(big_ref[0, k], ohc,
                            preferred_element_type=jnp.int32)
                acc = acc + r[:8]
            elif mode in ("dotbf16", "fullbf16"):
                r = jnp.dot(big_ref[0, k].astype(jnp.bfloat16),
                            ohc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                acc = acc + r[:8].astype(jnp.int32)
            else:
                acc = acc + ohc[:8].astype(jnp.int32)
        out_ref[0] = acc

    return kernel


cu = jnp.asarray(np.random.randint(0, 128, (B, T, WPS * 32, 128),
                                   dtype=np.int32))
big = jnp.asarray(np.random.randint(-128, 127, (B, WPS, M, GROUP),
                                    dtype=np.int32).astype(np.int8))
ohc0 = jnp.asarray(np.random.randint(0, 2, (B, GROUP, 128),
                                     dtype=np.int32).astype(np.int8))

for mode in (["full", "ohc", "dot", "dotbf16", "none"]
             if MODE == "all" else [MODE]):
    fn = jax.jit(lambda cu, big, ohc0, mode=mode: pl.pallas_call(
        make_kernel(mode),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, WPS * 32, 128),
                         lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WPS, M, GROUP), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
    )(cu, big, ohc0))
    t = chain(fn, cu, big, ohc0)
    print(f"{mode:8s}: {t*1e3:7.1f}ms")
