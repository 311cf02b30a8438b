import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
import fpng_tpu as F
from fpng_tpu.models.decoder import _parse_one
from fpng_tpu.ops.specdec import pack_lut
from fpng_tpu.ops import specdec_tpu as SD
from fpng_tpu.ops.bitpack import deposit_bits

def force1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1]))
def chain(f, *a, K=10):
    r=f(*a); force1(r)
    t0=time.perf_counter()
    for _ in range(K): r=f(*a)
    force1(r)
    return (time.perf_counter()-t0)/K

from fpng_tpu.train import real_corpus
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
nc=SD.plan_tpu(int(zl.max()))
sj,lj,pj,zj=map(jnp.asarray,(stream,luts,p0,zl))
meta4,chk,steps,fp=SD._decode_walk(sj,lj,pj,zj,nc_pad=nc,h=H,w=W,c=Cc)
smax=max(int(np.asarray(steps).max()),8); k8=min(-(-smax//32)*32,SD.ST8)
NC=nc; total=H*(1+W*Cc)
meta=jnp.swapaxes(meta4[:,:,:k8,:],2,3).reshape(B,NC,k8)
mu=jax.lax.bitcast_convert_type(meta,jnp.uint32)
n_rec=NC*k8
rs=jax.device_put((mu>>23).reshape(B,n_rec))
ro=jax.device_put((mu&0x7FFFFF).astype(jnp.int32).reshape(B,n_rec)*16)
nb_=jax.device_put(jnp.where(rs!=0,jnp.int32(16),0))
dep_words=-(-(16*(total+1))//32)+1
print("fix passes:", int(np.asarray(fp)));print(f"slots {B*n_rec/1e6:.1f}M k8={k8} NC={NC}")
for (g,wl) in ((2048,1152),(1024,768),(1024,640),(2048,1280),(4096,2304)):
    try:
        f=functools.partial(deposit_bits,num_words=dep_words,zero_init=True,group=g,wl=wl)
        t=chain(f,rs,nb_,ro)
        print(f"group={g} wl={wl}: {t*1e3:.1f}ms", flush=True)
    except Exception as e:
        print(f"group={g} wl={wl}: FAIL {type(e).__name__}", flush=True)
# finish total for reference
fin=functools.partial(SD._decode_finish,h=H,w=W,c=Cc,nc_pad=NC,k8=k8)
m4=jax.device_put(meta4); ch=jax.device_put(chk)
t=chain(fin,m4,ch,zj)
print(f"finish total: {t*1e3:.1f}ms")
