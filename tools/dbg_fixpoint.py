"""Scratch: per-pass fixpoint activity (diverged lanes / active groups)
on a small real corpus, via an instrumented Python-loop fixpoint using
the same walk passes (interpret on CPU, real kernels on TPU)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import (_BIG, _MEMB, _lane_tiles,
                                      _prep_w24_tiles, walk_pass_tpu,
                                      plan_tpu, LPI, ST8, S_TPU)
from fpng_tpu.train import real_corpus
from fpng_tpu.ops.bitpack import is_tpu_backend

size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
interp = not is_tpu_backend()

tiles = list(real_corpus(3, min(size, 256)))
imgs = np.stack((tiles * (-(-B // len(tiles))))[:B])[:, :size, :size]
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
NC = plan_tpu(int(zl.max()))
zl8 = jnp.asarray((zl * 8).reshape(B, 1).astype(np.int32))
lutp4 = jnp.asarray(luts.reshape(B, 4, 8, 128).astype(np.int32))
starts = np.arange(NC, dtype=np.int32) * S_TPU
dead = starts[None, :] >= np.asarray(zl8)
e0 = np.broadcast_to(starts, (B, NC)).copy()
e0[:, 0] = p0
w24r, ngr = _prep_w24_tiles(jnp.asarray(stream), NC, LPI)

res = walk_pass_tpu(w24r, lutp4, jnp.asarray(e0.reshape(B, ngr, 1, LPI)),
                    zl8, ng=ngr, lpi=LPI, interpret=interp)
x, _o, posr, raw0, raw1, nst = res
x = np.where(dead, 0, np.asarray(x).reshape(B, NC))
e = e0
rowi = np.arange(ST8).reshape(1, 1, ST8, 1)
total_live = int((~dead).sum())
print(f"lanes: {total_live} live / {B * NC}  groups {B}x{ngr}")
for p in range(1, 12):
    new_e = np.concatenate([p0[:, None], x[:, :-1]], axis=1)
    chg = (new_e != e) & ~dead
    pn = np.asarray(posr)
    r0n = np.asarray(raw0)
    r1n = np.asarray(raw1)
    nv = new_e.reshape(B, ngr, 1, LPI)
    rl = rowi[:, :, :_MEMB] < np.asarray(nst)
    hit1 = (pn[:, :, :_MEMB] == nv) & rl
    p2 = pn[:, :, :_MEMB] + ((r0n[:, :, :_MEMB] >> 19) & 15)
    hit2 = (r1n[:, :, :_MEMB] != 0) & (p2 == nv) & rl
    conv1 = hit1.any(axis=2).reshape(B, NC)
    conv = (hit1 | hit2).any(axis=2).reshape(B, NC)
    need1 = chg & ~conv1
    need = chg & ~conv
    print(f"   (first-pos only membership would diverge "
          f"{int(need1.sum())})")
    act_g = need.reshape(B, ngr, LPI).any(axis=2)
    print(f"pass {p}: changed {int(chg.sum())}, diverged {int(need.sum())}"
          f" lanes, active groups {int(act_g.sum())}/{B * ngr}")
    if not chg.any():
        break
    e_m = np.where(need, new_e, _BIG).astype(np.int32)
    order = np.argsort(~act_g, axis=1, kind="stable").astype(np.int32)
    n_act = act_g.sum(axis=1, keepdims=True)
    gi = np.minimum(np.arange(ngr)[None, :], np.maximum(n_act - 1, 0))
    remap = np.take_along_axis(order, gi, axis=1).astype(np.int32)
    res = walk_pass_tpu(w24r, lutp4, jnp.asarray(e_m.reshape(B, ngr, 1, LPI)),
                        zl8, (posr, raw0, raw1, nst), jnp.asarray(remap),
                        ng=ngr, lpi=LPI, interpret=interp)
    xn, _o, posr, raw0, raw1, nst = res
    x = np.where(need, np.asarray(xn).reshape(B, NC), x)
    x = np.where(dead, 0, x)
    e = new_e
