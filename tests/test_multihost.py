"""Multi-host (DCN) corpus-sharding dryrun: two jax.distributed
processes forming one global mesh; the training-histogram psum crosses
the process boundary (SURVEY §5.8's distributed-backend equivalent)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun():
    env = dict(os.environ)
    env["FPNG_TPU_MH_PORT"] = "37613"
    env.pop("XLA_FLAGS", None)  # the dryrun sets its own device count
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIHOST DRYRUN: OK" in r.stdout
