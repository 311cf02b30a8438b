"""Scratch: split _decode_walk cost into pass0 vs fixpoint on TPU."""
import os
import sys
import functools

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_kernels import corpus, chain
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import (_decode_walk, _lane_tiles,
                                      _prep_w24_tiles, walk_pass_tpu,
                                      plan_tpu, LPI)

B, size = 32, 512
imgs = corpus(size, B)
pngs = F.encode_batch(imgs, 0)
metas = [_parse_one(p) for p in pngs]
nb = 64
while nb < max(len(m[4]) for m in metas):
    nb *= 2
stream = np.zeros((B, nb), np.uint8)
luts = np.zeros((B, 4096), np.uint32)
p0 = np.zeros(B, np.int32)
zl = np.zeros(B, np.int32)
for j, m in enumerate(metas):
    _, _, _, _, src, p, z, lut = m
    stream[j, :len(src)] = np.frombuffer(src, np.uint8)
    luts[j] = pack_lut(lut)
    p0[j] = p
    zl[j] = z
nc_pad = plan_tpu(int(zl.max()))
sj, lj, pj, zj = map(jnp.asarray, (stream, luts, p0, zl))


@functools.partial(jax.jit, static_argnames=("nc_pad",))
def pass0_only(stream, lutp, p0, zlib_len, *, nc_pad):
    B = stream.shape[0]
    zl8 = (zlib_len * 8).reshape(B, 1)
    lutp4 = lutp.astype(jnp.uint32).reshape(B, 4, 8, 128) \
        .astype(jnp.int32)
    starts = (jnp.arange(nc_pad, dtype=jnp.int32) * 512)[None, :]
    e0 = jnp.broadcast_to(starts, (B, nc_pad)).at[:, 0].set(p0)
    w24r, ngr = _prep_w24_tiles(stream, nc_pad, LPI)
    return walk_pass_tpu(w24r, lutp4, e0.reshape(B, ngr, 1, LPI), zl8,
                         ng=ngr, lpi=LPI)


pf = functools.partial(pass0_only, nc_pad=nc_pad)
t = chain(pf, sj, lj, pj, zj)
print(f"pass0 only : {t*1e3:7.1f}ms")
wf = functools.partial(_decode_walk, nc_pad=nc_pad)
t = chain(wf, sj, lj, pj, zj)
print(f"full walk  : {t*1e3:7.1f}ms")
