"""Scratch: minimal hardware repro for the encoder HBM-output mode."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from fpng_tpu.models.encoder import _budget, build_desc
from fpng_tpu.ops.encfuse import (encode_bits_fused, materialize_units,
                                  pack_table)
from fpng_tpu.ops.bitpack import exclusive_offsets, scatter_bits
from fpng_tpu.tables import get_one_pass_tables

NW = int(os.environ.get("NW", "2700000"))
H = W = int(os.environ.get("SZ", "64"))
Cc = 3
rng = np.random.default_rng(3)
img = (rng.integers(-3, 4, (1, H, W, Cc)).cumsum(axis=1).cumsum(axis=2)
       % 256).astype(np.uint8)
prefix, acc, nacc, codes1, sizes1 = get_one_pass_tables(Cc)
codes = np.broadcast_to(codes1.astype(np.uint32), (1, 288)).copy()
sizes = np.broadcast_to(sizes1.astype(np.int32), (1, 288)).copy()
base = np.full(1, len(prefix) * 8, np.int32)
pv = np.full(1, acc, np.uint32)
pn = np.full(1, nacc, np.int32)
desc, tbl, *_ = build_desc(jnp.asarray(img), jnp.asarray(codes),
                           jnp.asarray(sizes), jnp.asarray(pv),
                           jnp.asarray(pn), num_chans=Cc, cost_check=False)
print("desc", desc.shape, "num_words", NW)
words, tot, ltk = encode_bits_fused(desc, tbl, jnp.asarray(base), NW)
tot_h = int(np.asarray(tot)[0])
print("total_bits", tot_h)
nw = (tot_h + 31) // 32
got = np.asarray(words)[0, :nw]
vals, nbits, ts = materialize_units(desc, jnp.asarray(codes),
                                    jnp.asarray(sizes))
offsets = exclusive_offsets(nbits, jnp.asarray(base))
want = np.asarray(scatter_bits(vals, nbits, offsets, nw))[0]
ok = np.array_equal(got, want)
print("match:", ok)
if not ok:
    bad = np.nonzero(got != want)[0]
    print("first bad word", bad[0], hex(got[bad[0]]), hex(want[bad[0]]),
          "nbad", len(bad))
