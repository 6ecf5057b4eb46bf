"""Static-shift bilinear warp — exact for bounded displacements.

For same-size warps (the ToFlow case: grid = identity + flow) with
per-pixel displacement |Δ| <= D, grid_sample factorizes into a sum over
(2D+2)² *static* shifts with per-pixel hat weights:

    out[i,j] = Σ_{dy,dx ∈ [-D, D+1]} wy(i,j,dy) · wx(i,j,dx) · feat[i+dy, j+dx]
    wy(i,j,dy) = max(0, 1 - |fy(i,j) - (i+dy)|) · valid(i+dy)   (hat = exact
    bilinear weight, since both taps lie within distance < 1)

This contains no gather at all — XLA fuses the shifted reads into one
VPU pass — so its cost scales with (2D+2)² instead of the ~27 ns/index
hardware gather cost.  Pixels with displacement > D are fixed up exactly
via the XLA gather path under a lax.cond (only executed when overflow
actually occurs), mirroring the Pallas-kernel fallback pattern.

Disabled by default: the break-even D depends on the real checkpoint's
flow statistics (see PERF.md); enable with ops.warp.set_shift_warp(D).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hat_weights(fcoord: jnp.ndarray, base: jnp.ndarray, d: int, size: int,
                 dtype) -> list:
    """Per-shift hat weights: list over s in [-d, d+1] of (B, H, W)."""
    out = []
    for s in range(-d, d + 2):
        pos = base + s                                   # (H or W,) broadcast
        w = jnp.maximum(0.0, 1.0 - jnp.abs(fcoord - pos))
        w = jnp.where((pos >= 0) & (pos < size), w, 0.0)
        out.append(w.astype(dtype))
    return out


def grid_sample_bilinear_shifts(feat: jnp.ndarray, grid: jnp.ndarray,
                                max_disp: int = 4) -> jnp.ndarray:
    """Warp feat (B, C, H, W) by grid (B, H, W, 2); exact for |Δ|<=max_disp,
    exact everywhere thanks to the cond-gather fixup."""
    from .warp import grid_sample_bilinear_xla

    b, c, h, w = feat.shape
    d = max_disp
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5                    # (B, H, W)
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    wys = _hat_weights(fy, rows, d, h, feat.dtype)       # 2d+2 of (B, H, W)
    wxs = _hat_weights(fx, cols, d, w, feat.dtype)

    # pad once; shifted reads are static slices of the padded buffer
    pad = d + 1
    fpad = jnp.pad(feat, ((0, 0), (0, 0), (pad, pad), (pad, pad)))

    acc = jnp.zeros_like(feat)
    for iy, dy in enumerate(range(-d, d + 2)):
        wy = wys[iy][:, None]                            # (B, 1, H, W)
        for ix, dx in enumerate(range(-d, d + 2)):
            shifted = jax.lax.dynamic_slice(
                fpad, (0, 0, pad + dy, pad + dx), (b, c, h, w))
            acc = acc + (wy * wxs[ix][:, None]) * shifted

    # exact fixup for pixels whose taps exceed the shift window
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    overflow = ((y0 < rows - d) & (y0 + 1 >= 0)) | (y0 > rows + d) \
        | ((x0 < cols - d) & (x0 + 1 >= 0)) | (x0 > cols + d)
    # only in-image taps matter (out-of-image contributes zero either way)
    overflow = overflow & (((y0 + 1 >= 0) & (y0 < h))
                           & ((x0 + 1 >= 0) & (x0 < w)))

    def fix(o):
        exact = grid_sample_bilinear_xla(feat, grid)
        return jnp.where(overflow[:, None], exact, o)

    return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, acc)
