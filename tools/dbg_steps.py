"""Scratch: per-lane record-depth distribution on the profile corpus -
sizes the shallow/deep split-deposit idea (deep rows beyond 32 are rare
but force k8 for every lane; if deep lanes cluster, a second deposit
call over the tail rows skips most groups via the n_eff guard)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from tools.profile_kernels import corpus
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import (_decode_walk, plan_tpu, LPI, ST8)

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
out = _decode_walk(jnp.asarray(stream), jnp.asarray(luts),
                   jnp.asarray(p0), jnp.asarray(zl), nc_pad=nc_pad)
posr, raw0, raw1, nst, e_fin, out0, steps, fp = out
# per-lane live record depth (matches the finalize row mask)
raw0 = np.asarray(raw0)
posr = np.asarray(posr)
nst = np.asarray(nst)
ng = posr.shape[1]
rowi = np.arange(ST8).reshape(1, 1, ST8, 1)
nv = np.asarray(e_fin).reshape(B, ng, 1, LPI)
valid = (((raw0 >> 9) & 1) != 0) & (posr >= nv) & (rowi < nst)
depth = np.max(np.where(valid, rowi + 1, 0), axis=2)  # (B, ng, LPI)
zl8 = (zl * 8)[:, None]
lanes = np.arange(nc_pad)[None, :] * 512
live = (lanes < zl8).reshape(B, ng, LPI)
d = depth[live]
print("live lanes:", d.size, "of", depth.size)
print("depth percentiles:",
      {p: int(np.percentile(d, p)) for p in (50, 75, 90, 95, 99, 99.9, 100)})
for cut in (32, 48, 64):
    frac = float((d > cut).mean())
    # clustering: fraction of 16/64-lane runs with ANY deep lane
    deep = (depth > cut) & live
    for gl in (16, 64):
        dg = deep.reshape(B, -1, gl).any(axis=2)
        lg = live.reshape(B, -1, gl).any(axis=2)
        print(f"cut {cut}: deep lanes {frac:.3%}; "
              f"{gl}-lane groups w/ deep: {float(dg[lg].mean()):.3%}")
print("fix passes:", int(np.asarray(fp)))
