"""Multi-host (DCN) corpus-sharding dryrun (SURVEY §5.8 / §2.3).

The reference is single-process; the TPU-native distributed-backend
equivalent is corpus sharding over hosts: each host loads its slice of
the corpus (DCN only moves files and the final metric reduction), forms
one global dp mesh over all hosts' chips, and the only cross-host
collective is the table-training histogram psum (parallel/mesh.py
training_step) - the codec hot path stays per-image local.

This dryrun validates that story end-to-end without a cluster: it
spawns two local processes, each with 4 virtual CPU devices,
jax.distributed-initialized into one 8-device global mesh.  Each
process:

  1. builds its PROCESS-LOCAL half of a deterministic corpus (the
     multi-host data-loading pattern),
  2. assembles the global dp-sharded batch from per-process shards
     (jax.make_array_from_single_device_arrays),
  3. runs the mesh training step - the histogram psum crosses the
     process boundary (the DCN collective),
  4. checks the reduced histogram against a locally computed
     full-corpus reference.

Usage:  python tools/dryrun_multihost.py          # parent: spawn + check
        python tools/dryrun_multihost.py child N  # internal
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("FPNG_TPU_MH_PORT", "37521"))


def child(pid: int) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC, process_id=pid)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from fpng_tpu.parallel.mesh import make_mesh, training_step

    devs = jax.devices()
    assert len(devs) == N_PROC * DEV_PER_PROC, len(devs)
    assert len(jax.local_devices()) == DEV_PER_PROC
    mesh = make_mesh(devs)

    # deterministic corpus; each process materializes only its half
    # (multi-host corpus sharding: B images, contiguous per-process
    # blocks of B // N_PROC)
    B, H, W, C = 8, 24, 24, 3
    rng = np.random.default_rng(7)
    full = rng.normal(128, 12, (B, H, W, C)).clip(0, 255).astype(np.uint8)
    full[:, 6:10] = 77
    lo = pid * (B // N_PROC)
    local = full[lo:lo + B // N_PROC]

    # per-device shards -> one global dp-sharded array across hosts
    sharding = NamedSharding(mesh, P("dp"))
    per_dev = np.split(local, DEV_PER_PROC, axis=0)
    arrs = [jax.device_put(a, d)
            for a, d in zip(per_dev, jax.local_devices())]
    gimgs = jax.make_array_from_single_device_arrays(
        (B, H, W, C), sharding, arrs)

    ghist = training_step(mesh, gimgs, C)
    # the psum output is fully replicated: any local shard holds the
    # global reduction (reading it = the "DCN metric fetch")
    shards = [np.asarray(s.data) for s in ghist.addressable_shards]
    assert all(np.array_equal(s, shards[0]) for s in shards)
    ghist = shards[0]

    # reference: full-corpus histogram computed locally (no mesh)
    from fpng_tpu.models.encoder import hist_kernel

    want = np.asarray(hist_kernel(jax.device_put(
        full, jax.local_devices()[0]), num_chans=C)).sum(axis=0)
    assert np.array_equal(ghist, want), "cross-host psum mismatch"
    print(f"proc {pid}: global hist ok ({int(ghist.sum())} tokens)")
    return 0


def parent() -> int:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "") +
                      f" --xla_force_host_platform_device_count="
                      f"{DEV_PER_PROC}").strip(),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(N_PROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        ok = p.returncode == 0 and "hist ok" in out
        print(f"--- process {i} (rc={p.returncode}) ---")
        print(out.strip()[-2000:])
        rc |= 0 if ok else 1
    print("MULTIHOST DRYRUN:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        sys.exit(child(int(sys.argv[2])))
    sys.exit(parent())
