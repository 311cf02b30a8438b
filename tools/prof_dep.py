"""Scratch: split record transpose vs deposit cost on TPU."""
import os, sys, functools, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from tools.profile_kernels import corpus, chain
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops.specdec_tpu import (_decode_walk, _finalize_records,
                                      _bpl_pad, plan_tpu)
from fpng_tpu.ops.bitpack import scatter_packed16_tpu

B, size = 32, 512
imgs = corpus(size, B)
H = W = size; Cc = 3
pngs = F.encode_batch(imgs, 0)
metas = [_parse_one(p) for p in pngs]
nb = 64
while nb < max(len(m[4]) for m in metas):
    nb *= 2
stream = np.zeros((B, nb), np.uint8)
luts = np.zeros((B, 4096), np.uint32)
p0 = np.zeros(B, np.int32); zl = np.zeros(B, np.int32)
for j, m in enumerate(metas):
    _, _, _, _, src, p, z, lut = m
    stream[j, :len(src)] = np.frombuffer(src, np.uint8)
    luts[j] = pack_lut(lut); p0[j] = p; zl[j] = z
nc_pad = plan_tpu(int(zl.max()))
sj, lj, pj, zj = map(jnp.asarray, (stream, luts, p0, zl))
wout = _decode_walk(sj, lj, pj, zj, nc_pad=nc_pad)
posr, raw0, raw1, nst, e_fin, out0 = [jax.device_put(a) for a in wout[:6]]
k8 = 96
row_stride = 1 + W * Cc
geom = (row_stride, H * row_stride, Cc, _bpl_pad(W * Cc))
fzf = jax.jit(functools.partial(_finalize_records, k8=k8, geom=geom))
meta4, metb4, _ = fzf(posr[:, :, :k8], raw0[:, :, :k8], raw1[:, :, :k8],
                      nst, e_fin, out0)
meta4 = jax.device_put(meta4); metb4 = jax.device_put(metb4)
bpl_pad = _bpl_pad(W * Cc)
dep_words = (-(-H // 8) * 8) * (bpl_pad // 2)

@jax.jit
def trans(meta4, metb4):
    return (meta4.reshape(B, -1), metb4.reshape(B, -1))

t = chain(trans, meta4, metb4)
print(f"reshape   : {t*1e3:7.1f}ms")
meta, metb = [jax.device_put(a) for a in trans(meta4, metb4)]

@jax.jit
def dep(meta, metb):
    return scatter_packed16_tpu(meta, dep_words, metb=metb)

t = chain(dep, meta, metb)
print(f"deposit   : {t*1e3:7.1f}ms  N={meta.shape[1]}")

sweep = os.environ.get("FPNG_TPU_DEP_SWEEP", "")
geoms = ((2048, 1152), (4096, 2176), (8192, 4224), (16384, 8448)) \
    if sweep == "1" else ()
if sweep == "2":
    # records are ~55% live on photo corpora: the slot span of a
    # 4096-unit group is ~1100 words, so wl can shrink below group/2
    # (overflow degrades to extra loop windows, still correct)
    geoms = ((4096, 1408), (4096, 1664), (8192, 2560), (8192, 3200))
for grp, wl in geoms:
    @jax.jit
    def dep2(meta, metb, grp=grp, wl=wl):
        return scatter_packed16_tpu(meta, dep_words, metb=metb,
                                    group=grp, wl=wl)
    try:
        t = chain(dep2, meta, metb)
        print(f"deposit g={grp} wl={wl}: {t*1e3:7.1f}ms")
    except Exception as e:
        print(f"deposit g={grp} wl={wl}: FAIL {str(e)[:80]}")
