"""Data-parallel RLE match resolution (the fpng LZ parse, reformulated).

The reference's sequential greedy loop (fpng.cpp:1045-1082) becomes three
row-wise scans over the whole batch:

  1. pixel equality vs the left neighbor,
  2. a forward running-max locating the most recent literal pixel (giving
     each match pixel its position inside its run), and
  3. a backward running-min locating the next literal pixel (giving each
     run-start its remaining run length).

Greedy left-to-right splitting with the 255/252-byte cap is then a pure
elementwise predicate: a match token starts wherever (position-in-run - 1)
is a multiple of the cap.  This reproduces the reference parse exactly,
token for token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MATCH_CAP_PIXELS


def match_fields(deltas: jnp.ndarray, num_chans: int):
    """Resolve RLE structure for a batch of filtered images.

    deltas: (B, H, W, C) uint8 filtered bytes viewed as pixels.
    Returns (eq, match_start, match_px_len):
      eq:           (B, H, W) bool  - pixel equals its left neighbor
      match_start:  (B, H, W) bool  - a match token starts here
      match_px_len: (B, H, W) int32 - token length in pixels (match starts)
    """
    B, H, W, Cc = deltas.shape
    cap = MATCH_CAP_PIXELS[num_chans]

    d = deltas
    eq = jnp.concatenate(
        [jnp.zeros((B, H, 1), bool),
         jnp.all(d[:, :, 1:] == d[:, :, :-1], axis=-1)], axis=2)

    x_idx = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    # last literal pixel at or before x  (pixel 0 is always literal)
    lit_before = jnp.where(eq, jnp.int32(-1), x_idx)
    last_lit = jax.lax.cummax(lit_before, axis=2)
    pos_in_run = x_idx - last_lit  # >= 1 for match pixels

    # first literal pixel at or after x (W sentinel = row end)
    lit_after = jnp.where(eq, jnp.int32(W), x_idx)
    next_lit = jax.lax.cummin(lit_after, axis=2, reverse=True)

    match_start = eq & (((pos_in_run - 1) % cap) == 0)
    run_rem = next_lit - x_idx
    match_px_len = jnp.where(match_start, jnp.minimum(run_rem, cap), 0)
    return eq, match_start, match_px_len.astype(jnp.int32)
