"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh (multi-chip sharding tests run
without TPU hardware) and builds the reference-oracle shared library once
per session.
"""

import ctypes
import os
import subprocess
import sys

# Tests always run on a virtual 8-device CPU mesh.  The container's
# sitecustomize registers the axon TPU plugin and forces JAX_PLATFORMS=axon,
# so override both the env and (since jax may already be imported) the
# config value itself.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ref_oracle import REFERENCE_SRC, RefOracle, _build_ref_shim  # noqa: E402,F401



@pytest.fixture(scope="session")
def reflib():
    so = _build_ref_shim()
    if so is None:
        pytest.skip("reference oracle unavailable (no toolchain/reference)")
    return RefOracle(so)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xF96)


def make_test_image(rng, h, w, c, kind="mixed"):
    """Structured test image: flat runs + gradients + noise."""
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if kind in ("mixed", "flat") and h >= 4 and w >= 4:
        img[h // 4:h // 2, :] = rng.integers(0, 256, c, dtype=np.uint8)
        img[:, w // 4:w // 3] = rng.integers(0, 256, c, dtype=np.uint8)
    if kind == "mixed" and h >= 8:
        grad = (np.arange(w, dtype=np.int32)[None, :, None] % 256)
        img[3 * h // 4:, :, :] = (grad + img[3 * h // 4:, :1, :1]).astype(np.uint8)
    if c == 4 and kind != "noise":
        img[..., 3] = np.where(rng.random((h, w)) < 0.7, 255, img[..., 3])
    return img


@pytest.fixture(scope="session")
def images(rng):
    """A varied set of (img,) test images across shapes/channels."""
    shapes = [(1, 1), (1, 7), (7, 1), (2, 2), (13, 17), (16, 16),
              (33, 7), (64, 64), (40, 100), (3, 300), (127, 31)]
    out = []
    for c in (3, 4):
        for h, w in shapes:
            for kind in ("mixed", "flat", "noise"):
                out.append(make_test_image(rng, h, w, c, kind))
    return out
