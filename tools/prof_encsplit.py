"""Scratch: split encfuse kernel cost into decode-side vs deposit-side."""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import fpng_tpu.ops.encfuse as EF
from fpng_tpu.ops.bitpack import _SUB, _U, _window_deposit

def force1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1]))

def chain(f, *a, K=10):
    r = f(*a); force1(r)
    t0 = time.perf_counter()
    for _ in range(K): r = f(*a)
    force1(r)
    return (time.perf_counter() - t0) / K

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"

def _kernel(base_ref, desc0_ref, desc1_ref, tbl_ref, out_ref,
            tot_ref, ltk_ref, pending, prevr, carry, ltokv):
    b = pl.program_id(0); t = pl.program_id(1)
    sub8 = 8 * _SUB
    @pl.when(t == 0)
    def _():
        pending[...] = jnp.zeros_like(pending)
        carry[0] = base_ref[b, 0]
        ltokv[...] = jnp.full_like(ltokv, -1)
        prevr[0] = (base_ref[b, 0] >> 5) // 128
    grows = EF._GUE // 128
    idxv = (jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 0) * 128 +
            jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 1)).reshape(EF._GUE)
    lt128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) <=
             jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(jnp.bfloat16)
    subl = jax.lax.broadcasted_iota(jnp.int32, (sub8, 128), 0)
    tbl_rows = [tbl_ref[0, r:r + 1, :] for r in range(3)]
    if MODE in ("full", "decode"):
        val0, n0, ts0 = EF._unit_decode(desc0_ref[0, 0, :, :], tbl_rows, sub8)
        val1, n1, ts1 = EF._unit_decode(desc1_ref[0, 0, :, :], tbl_rows, sub8)
        val = val0 | (val1 << n0.astype(jnp.uint32))
        n = n0 + n1
    else:  # deposit-only: synthetic fixed-width units
        val = (desc0_ref[0, 0, :, :].astype(jnp.uint32) & 0xFFF) | 1
        n = jnp.full((sub8, 128), 12, jnp.int32)
        ts0 = ts1 = n * 0
    s_inc = jnp.dot(n.astype(jnp.bfloat16), lt128,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    s = jnp.broadcast_to(s_inc[:, 127:128], (sub8, 128))
    sh_ = 1
    while sh_ < sub8:
        s = s + jnp.where(subl >= sh_, pltpu.roll(s, sh_, 0), 0)
        sh_ *= 2
    rb = jnp.where(subl >= 1, pltpu.roll(s, 1, 0), 0)
    cb = carry[0]
    offs = cb + rb + s_inc - n
    carry[0] = cb + jnp.sum(n)
    ltokv[...] = jnp.maximum(ltokv[...], jnp.where(ts0 == 1, offs, -1))
    if MODE in ("full", "deposit"):
        gbits = cb
        for k in range((8 * _SUB) // grows):
            vf = val[grows * k:grows * (k + 1), :].reshape(EF._GUE)
            of = offs[grows * k:grows * (k + 1), :].reshape(EF._GUE)
            _window_deposit(vf, of, idxv, EF._WLE, out_ref, pending, prevr,
                            base0=(gbits >> 5) // 128)
            gbits = gbits + jnp.sum(n[grows * k:grows * (k + 1), :])
    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        tot_ref[b, 0] = carry[0]
        ltk_ref[b, 0] = jnp.max(ltokv[...])

@functools.partial(jax.jit, static_argnames=("num_words",))
def run(desc, tbl, base_bits, num_words):
    B, N = desc.shape
    step = _U * _SUB
    N2 = -(-N // 2)
    T = -(-N2 // step)
    pad = 2 * T * step - N
    if pad:
        desc = jnp.concatenate([desc, jnp.zeros((B, pad), desc.dtype)], axis=1)
    sub8 = 8 * _SUB
    desc2 = desc.astype(jnp.int32).reshape(B, T * step, 2)
    desc0 = desc2[:, :, 0].reshape(B, T, sub8, 128)
    desc1 = desc2[:, :, 1].reshape(B, T, sub8, 128)
    rows = -(-num_words // 128) + EF._WRE + 1
    return pl.pallas_call(
        _kernel, grid=(B, T),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * EF._WRE, 128), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((sub8, 128), jnp.int32),
        ],
    )(base_bits.astype(jnp.int32).reshape(B, 1), desc0, desc1, tbl.astype(jnp.int32))

def main():
    from fpng_tpu.models.encoder import _budget, build_desc
    from fpng_tpu.tables import get_one_pass_tables
    sys.path.insert(0, "/root/repo/tools")
    from profile_kernels import corpus
    B, size = 32, 512
    imgs = corpus(size, B)
    H = W = size; Cc = 3
    mpix = B * H * W / 1e6
    prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
    codes = jnp.asarray(np.broadcast_to(codes1.astype(np.uint32), (B, 288)).copy())
    sizes = jnp.asarray(np.broadcast_to(sizes1.astype(np.int32), (B, 288)).copy())
    bb = jnp.asarray(np.full(B, len(prefix) * 8, np.int32))
    pv = jnp.asarray(np.full(B, acc, np.uint32))
    pn = jnp.asarray(np.full(B, nacc, np.int32))
    dev = jnp.asarray(imgs)
    budget = _budget(H, W, Cc)
    num_words = max(budget // 4 + 4, 8)
    desc_fn = jax.jit(functools.partial(build_desc, num_chans=Cc, cost_check=False))
    out = desc_fn(dev, codes, sizes, pv, pn)
    desc, tbl = jax.device_put(out[0]), jax.device_put(out[1])
    t = chain(functools.partial(run, num_words=num_words), desc, tbl, bb)
    print(f"{MODE}: {t*1e3:7.1f}ms  {mpix/t:6.0f} MP/s")

main()
