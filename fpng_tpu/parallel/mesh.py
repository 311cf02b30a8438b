"""Multi-chip scaling: batch-sharded codec over a jax.sharding.Mesh.

A PNG batch is embarrassingly data-parallel (per-image independence,
SURVEY.md §2.3), so corpus throughput scales by sharding the batch axis
over ICI and letting XLA run the same encode program per shard.  The only
collective in the framework is the table-training step: per-shard token
histograms are psum-reduced across the mesh (the analog of gradient
all-reduce), after which table construction is replicated host work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, arr, axis: str = "dp"):
    """Place a (B, ...) array batch-sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def encode_batch_sharded(mesh: Mesh, images: np.ndarray, flags: int = 0):
    """encode_batch with the batch dimension sharded across the mesh.

    B must be divisible by the mesh size.  The XLA program is identical to
    the single-chip one; sharding the inputs makes XLA partition it.
    """
    from ..models import encoder as enc

    images = np.ascontiguousarray(images, dtype=np.uint8)
    B = images.shape[0]
    ndev = mesh.devices.size
    if B % ndev:
        raise ValueError(f"batch {B} not divisible by mesh size {ndev}")
    # The host driver in encode_batch works unchanged: device_put the
    # sharded batch and let jit propagate shardings.
    sharded = shard_batch(mesh, images)
    return enc.encode_batch_device_input(sharded, images, flags)


def training_step(mesh: Mesh, imgs, num_chans: int, axis: str = "dp"):
    """One table-training step over a sharded corpus batch.

    Per-shard 288-bin token histograms, psum-reduced over the mesh -
    the framework's all-reduce step (everything else is per-image local).
    Returns the replicated (288,) uint64-ready histogram.
    """
    from ..models.encoder import hist_kernel

    def local_step(local_imgs):
        h = hist_kernel(local_imgs, num_chans=num_chans)
        total = jnp.sum(h, axis=0, dtype=jnp.int64) \
            if jax.config.x64_enabled else jnp.sum(h, axis=0)
        return jax.lax.psum(total, axis)

    fn = jax.shard_map(local_step, mesh=mesh,
                       in_specs=P(axis), out_specs=P())
    return fn(imgs)


def decode_batch_sharded(mesh: Mesh, pngs: list, h: int, w: int, ch: int,
                         axis: str = "dp"):
    """dp-sharded device decode of same-shape dynamic-block fpng files.

    The XLA program is the same one decode_batch runs per shape group
    (models/decoder.py:124-160); sharding the batch axis makes XLA
    partition it over the mesh — per-image independence means no hot-path
    collectives (SURVEY.md §2.3).  Returns (imgs (B,h,w,ch) u8, ok (B,)).
    """
    from ..models.decoder import _parse_one
    from ..ops.bitpack import is_tpu_backend
    from ..ops.specdec import decode_kernel, pack_lut, plan_chunks
    from ..ops.specdec_tpu import decode_kernel_tpu, plan_tpu

    B = len(pngs)
    ndev = mesh.devices.size
    if B % ndev:
        raise ValueError(f"batch {B} not divisible by mesh size {ndev}")
    metas = [_parse_one(p) for p in pngs]
    for status, mw, mh, mc, src, p0b, zlen, lut in metas:
        if status != 0 or lut is None or (mw, mh, mc) != (w, h, ch):
            raise ValueError("decode_batch_sharded needs uniform dynamic-"
                             "block fpng files")
    max_len = max(len(m[4]) for m in metas)
    nb = 64
    while nb < max_len:
        nb *= 2
    stream = np.zeros((B, nb), np.uint8)
    luts = np.zeros((B, 4096), np.uint32)
    p0 = np.zeros(B, np.int32)
    zl = np.zeros(B, np.int32)
    for j, m in enumerate(metas):
        _, _, _, _, src, p, zlib_len, lut = m
        stream[j, :len(src)] = np.frombuffer(src, np.uint8)
        luts[j] = pack_lut(lut)
        p0[j] = p
        zl[j] = zlib_len
    sh = lambda a: shard_batch(mesh, a, axis)  # noqa: E731
    if is_tpu_backend():
        imgs, ok = decode_kernel_tpu(
            sh(stream), sh(luts), sh(p0), sh(zl), h=h, w=w, c=ch,
            nc_pad=plan_tpu(int(zl.max())))
    else:
        s_bits, n_chunks, max_steps = plan_chunks(nb)
        imgs, ok, _ = decode_kernel(
            sh(stream), sh(luts), sh(p0), sh(zl), h=h, w=w, c=ch,
            n_chunks=n_chunks, chunk_bits=s_bits, max_steps=max_steps)
    return imgs, ok


@functools.partial(jax.jit, static_argnames=("num_chans", "num_words"))
def _encode_step_for_dryrun(imgs, codes, sizes, base_bits, pend_val, pend_n,
                            *, num_chans, num_words):
    from ..models.encoder import encode_kernel

    return encode_kernel(imgs, codes, sizes, base_bits, pend_val, pend_n,
                         num_chans=num_chans, cost_check=False,
                         want_hist=True, num_words=num_words)


def full_step_sharded(mesh: Mesh, images: np.ndarray, num_chans: int,
                      axis: str = "dp"):
    """Full sharded pipeline step used by the multichip dry-run:

    dp-sharded encode (filter->tokenize->bitpack->adler) + histogram with
    a cross-mesh psum reduction, jitted over the mesh in one program.
    """
    B, H, W, Cc = images.shape
    budget = ((58 + (W * Cc + 1) * H + 7) & ~7) - 58
    num_words = max(budget // 4 + 4, 8)

    from ..tables import get_one_pass_tables
    prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(num_chans)
    codes = np.broadcast_to(codes1.astype(np.uint32), (B, 288)).copy()
    sizes = np.broadcast_to(sizes1.astype(np.int32), (B, 288)).copy()

    imgs = shard_batch(mesh, np.ascontiguousarray(images, np.uint8), axis)
    codes = shard_batch(mesh, codes, axis)
    sizes = shard_batch(mesh, sizes, axis)
    b1 = shard_batch(mesh, np.full(B, len(prefix) * 8, np.int32), axis)
    pv = shard_batch(mesh, np.full(B, acc, np.uint32), axis)
    pn = shard_batch(mesh, np.full(B, nacc, np.int32), axis)

    words, total_bits, last_tok, adler, hist = _encode_step_for_dryrun(
        imgs, codes, sizes, b1, pv, pn,
        num_chans=num_chans, num_words=num_words)
    # mesh-wide histogram reduction (the training collective)
    ghist = training_step(mesh, imgs, num_chans, axis)
    return words, total_bits, adler, ghist
