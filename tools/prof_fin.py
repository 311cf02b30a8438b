import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("FPNG_TPU_BUCKET_DENSITY", "8")
import numpy as np, jax, jax.numpy as jnp
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops import specdec_tpu as SD
from fpng_tpu.ops.bitpack import scatter_packed16_tpu
from fpng_tpu.train import real_corpus

def force1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1]))
def chain(f, *a, K=10):
    r=f(*a); force1(r)
    t0=time.perf_counter()
    for _ in range(K): r=f(*a)
    force1(r)
    return (time.perf_counter()-t0)/K

B=32
tiles=list(real_corpus(3,256)); reps=-(-B//len(tiles))
imgs=np.tile(np.stack((tiles*reps)[:B]),(1,2,2,1))
H=W=512; Cc=3
pngs=F.encode_batch(imgs,0)
metas=[_parse_one(p) for p in pngs]
nb=64
while nb<max(len(m[4]) for m in metas): nb*=2
stream=np.zeros((B,nb),np.uint8); luts=np.zeros((B,4096),np.uint32)
p0=np.zeros(B,np.int32); zl=np.zeros(B,np.int32)
for j,m in enumerate(metas):
    _,_,_,_,src,p,z,lut=m
    stream[j,:len(src)]=np.frombuffer(src,np.uint8); luts[j]=pack_lut(lut); p0[j]=p; zl[j]=z
NC=SD.plan_tpu(int(zl.max()))
sj,lj,pj,zj=map(jnp.asarray,(stream,luts,p0,zl))
meta4,chk,steps,fp=SD._decode_walk(sj,lj,pj,zj,nc_pad=NC,h=H,w=W,c=Cc)
print("fix passes:", int(np.asarray(fp)), "NC:", NC)
smax=max(int(np.asarray(steps).max()),8); k8=min(-(-smax//32)*32,SD.ST8)
total=H*(1+W*Cc); n_rec=NC*k8
hbpl=H*W*Cc
dep_words=-(-(16*(hbpl+1))//32)+1
m4=jax.device_put(meta4); ch=jax.device_put(chk)

@jax.jit
def transpose_only(meta4):
    return jnp.swapaxes(meta4[:,:,:k8,:],2,3).reshape(B,NC*k8)
t=chain(transpose_only,m4); print(f"transpose: {t*1e3:.1f}ms")
metaflat=jax.device_put(transpose_only(m4))
t=chain(functools.partial(scatter_packed16_tpu,num_words=dep_words),metaflat)
print(f"packed deposit: {t*1e3:.1f}ms")
dep=jax.device_put(scatter_packed16_tpu(metaflat,num_words=dep_words))

@jax.jit
def expand_only(dep):
    pairs=jax.lax.bitcast_convert_type(dep,jnp.uint8).reshape(B,dep_words*4)[:, :2*hbpl].reshape(B,hbpl,2)
    syms_px=pairs[...,0].reshape(B,H,W,Cc)
    plit=pairs[...,1].reshape(B,H,W,Cc)[...,0]>0
    payload=jnp.zeros((B,H,W),jnp.int32)
    for k in range(Cc):
        payload=payload|(syms_px[...,k].astype(jnp.int32)<<(8*k))
    def comb(a,b):
        (pa,fa),(pb,fb)=a,b
        return jnp.where(fb,pb,pa), fa|fb
    filled,_=jax.lax.associative_scan(comb,(payload,plit),axis=2)
    deltas=jnp.stack([(filled>>(8*k))&0xFF for k in range(Cc)],axis=-1).astype(jnp.int32)
    return jnp.cumsum(deltas,axis=1).astype(jnp.uint8)
t=chain(expand_only,dep); print(f"expand: {t*1e3:.1f}ms")
fin=functools.partial(SD._decode_finish,h=H,w=W,c=Cc,nc_pad=NC,k8=k8)
t=chain(fin,m4,ch,zj); print(f"finish total: {t*1e3:.1f}ms")
