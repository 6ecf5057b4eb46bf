"""Time-axis interpolation with torch ``F.interpolate`` parity.

Two variants used by the pipeline:
- linear + align_corners=True: wav2vec2 conv-feature resampling to the video
  frame grid (reference: src/nodes/models/wav2vec2.py:184-197),
- nearest: per-chunk dynamic-emotion upsampling to total video frames
  (reference: src/nodes/nodes_vadv.py:833-840).
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_interpolate_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linearly resample (B, T, D) along T to out_len, align_corners=True.

    align_corners=True maps output index j to input position
    j * (T-1) / (out_len-1); endpoints map exactly onto endpoints.
    """
    b, t, d = x.shape
    if out_len == t:
        return x
    if t == 1:
        return jnp.broadcast_to(x, (b, out_len, d))
    pos = jnp.arange(out_len, dtype=jnp.float32) * ((t - 1) / (out_len - 1)) \
        if out_len > 1 else jnp.zeros((1,), jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, t - 2)
    frac = (pos - i0.astype(jnp.float32)).astype(x.dtype)[None, :, None]
    x0 = x[:, i0, :]
    x1 = x[:, i0 + 1, :]
    return x0 * (1 - frac) + x1 * frac


def nearest_interpolate_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor resample (B, T, D) along T to out_len.

    torch 'nearest' uses floor(j * T / out_len) index selection.
    """
    b, t, d = x.shape
    if out_len == t:
        return x
    idx = jnp.floor(
        jnp.arange(out_len, dtype=jnp.float32) * (t / out_len)
    ).astype(jnp.int32)
    idx = jnp.clip(idx, 0, t - 1)
    return x[:, idx, :]
