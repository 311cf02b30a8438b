"""Batched PNG filtering as pure XLA ops.

The fpng filter scheme (row 0: None, rows 1..: Up) is a first-difference
along the row axis; the inverse is a running sum.  Both are single fused
XLA ops over the whole batch - this is the TPU restatement of the SSE
`_mm_sub_epi8` scanline loop (reference: fpng.cpp:1592-1660).
"""

from __future__ import annotations

import jax.numpy as jnp


def filter_deltas(imgs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> per-row byte deltas vs previous scanline.

    Row 0 is returned raw (filter 0); rows 1.. are cur - prev (filter 2).
    """
    assert imgs.dtype == jnp.uint8
    prev = jnp.pad(imgs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    return imgs - prev  # uint8 wraparound == mod-256 byte delta
