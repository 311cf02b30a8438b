"""Small-table lookups as one-hot MXU matmuls.

XLA TPU lowers general gathers to ~100 Melem/s serialized loops; the
encoder needs ~N lookups into 288-entry per-image code tables.  A one-hot
matmul keeps everything dense: exactness holds because each one-hot row
selects a single table entry (no accumulation), so any plane whose values
fit the accumulation dtype is reproduced bit-exactly.  Planes are split
into bytes so bf16 operands stay exact (integers <= 255).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_small(tables: jnp.ndarray, idx: jnp.ndarray, num: int):
    """tables: (B, K, P) int planes (each value < 2^16); idx: (B, N) in
    [0, K).  Returns (B, N, P) int32 via one-hot bf16 matmuls.
    """
    B, K, P = tables.shape
    lo = (tables & 255).astype(jnp.bfloat16)
    hi = (tables >> 8).astype(jnp.bfloat16)
    planes = jnp.concatenate([lo, hi], axis=2)          # (B, K, 2P)
    oh = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)     # (B, N, K)
    r = jax.lax.dot_general(
        oh, planes, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return r[..., :P] | (r[..., P:] << 8)


def take_codes_sizes(codes: jnp.ndarray, sizes: jnp.ndarray,
                     idx: jnp.ndarray):
    """(B, 288) uint32 codes (<= 12 bits) + int32 sizes, idx (B, N).

    Returns (code (B, N) uint32, size (B, N) int32) exactly.
    """
    tabs = jnp.stack([codes.astype(jnp.int32), sizes.astype(jnp.int32)],
                     axis=2)
    r = take_small(tabs, idx, 2)
    return r[..., 0].astype(jnp.uint32), r[..., 1]
