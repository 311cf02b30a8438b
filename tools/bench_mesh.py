"""Multi-chip corpus benchmark (SURVEY §7 P8).

Runs the dp-sharded encode + decode pipeline over a jax.sharding.Mesh and
reports per-mesh-size throughput and scaling efficiency.  On real
multi-chip hardware this measures ICI-sharded corpus throughput; with one
chip (or none) it provisions a virtual N-device CPU mesh
(--xla_force_host_platform_device_count) — the same mechanism the driver's
multichip dryrun uses — so the sharded program's correctness and scaling
shape are validated even without hardware.  CPU numbers measure the XLA
partitioner, not TPU speed; the JSON says which mode ran.

Usage: python tools/bench_mesh.py [ndev] [size] [batch-per-device]
"""

import json
import os
import sys

ndev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
bpd = int(sys.argv[3]) if len(sys.argv) > 3 else 4

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _ensure_devices(n):
    if os.environ.get("_BENCH_MESH_VIRT") == "1":
        return "virtual-cpu"
    import jax
    try:
        if len(jax.devices()) >= n:
            return "hardware"
    except RuntimeError:
        pass
    # re-exec onto a virtual CPU mesh before jax state is live
    if os.environ.get("_BENCH_MESH_VIRT") != "1":
        env = dict(os.environ, _BENCH_MESH_VIRT="1", JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="",
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                              f" --xla_force_host_platform_device_count={n}"
                              ).strip())
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    return "virtual-cpu"


mode = _ensure_devices(ndev)

import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402

import fpng_tpu as F  # noqa: E402
from fpng_tpu.parallel import mesh as M  # noqa: E402
from fpng_tpu.train import real_corpus, synthetic_corpus  # noqa: E402


def corpus(B, size):
    tiles = list(real_corpus(3, size)) or \
        [np.ascontiguousarray(t[:size, :size])
         for t in synthetic_corpus(3, size=size)]
    reps = -(-B // len(tiles))
    return np.stack((tiles * reps)[:B])


def run(n, imgs):
    mesh = M.make_mesh(jax.devices()[:n])
    B, H, W, Cc = imgs.shape
    mpix = B * H * W / 1e6

    pngs = M.encode_batch_sharded(mesh, imgs, 0)  # compile + warm
    t0 = time.perf_counter()
    pngs = M.encode_batch_sharded(mesh, imgs, 0)
    enc = time.perf_counter() - t0

    keep = [p for p in pngs if p is not None]
    dimgs, ok = M.decode_batch_sharded(mesh, keep, H, W, Cc)
    np.asarray(ok)
    t0 = time.perf_counter()
    dimgs, ok = M.decode_batch_sharded(mesh, keep, H, W, Cc)
    okh = np.asarray(ok)
    dec = time.perf_counter() - t0

    assert bool(okh.all()), "sharded decode rejected its own stream"
    assert np.array_equal(np.asarray(dimgs), imgs)
    ghist = M.training_step(mesh, M.shard_batch(mesh, imgs), 3)
    assert int(np.asarray(ghist).sum()) > 0
    return mpix / enc, mpix / dec


def main():
    sizes = [1]
    n = 2
    while n <= ndev:
        sizes.append(n)
        n *= 2
    imgs = corpus(bpd * ndev, size)
    rows = {}
    base = None
    for n in sizes:
        e, d = run(n, imgs)
        agg = 1.0 / (1.0 / e + 1.0 / d)
        if base is None:
            base = agg
        rows[str(n)] = {"encode_mps": round(e, 2), "decode_mps": round(d, 2),
                        "aggregate_mps": round(agg, 2),
                        "scaling_eff": round(agg / (base * n), 3)}
    print(json.dumps({
        "metric": "mesh-sharded corpus throughput",
        "mode": mode,
        "corpus": f"{bpd * ndev}x{size}x{size}x3",
        "mesh_sizes": rows,
    }))


if __name__ == "__main__":
    main()
