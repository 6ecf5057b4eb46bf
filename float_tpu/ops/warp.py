"""Bilinear grid sampling (flow warping) — torch ``F.grid_sample`` parity.

Semantics matched: bilinear, ``padding_mode='zeros'``, ``align_corners=False``
(reference usage: src/nodes/models/float/styledecoder.py:423).

TPU-native formulation: XLA:TPU gather cost is dominated by the *index
count* (~35 ns/index on v5e, nearly independent of slice size — measured),
so the four bilinear taps are fused into ONE gather per output pixel that
fetches a (2, 2, C) channels-last patch at (floor(y), floor(x)).  Border
handling clamps the patch start into range and *re-maps the bilinear
weights onto the patch rows/cols*, which reproduces zero padding exactly
without extra gathers.

(A per-tap take_along_axis formulation measured 4x slower; a Pallas
windowed weighted-selection-matmul kernel is the next step for the big
levels — see ops/pallas/warp kernel work.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _identity_grid_np(size: int, dtype_name: str):
    import numpy as np
    xs = np.linspace(-1.0, 1.0, size, dtype=dtype_name)
    gx, gy = np.meshgrid(xs, xs)
    return np.stack([gx, gy], axis=-1)


def identity_grid(size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) identity sampling grid in [-1, 1], xy order.

    Matches the reference's ``np.linspace(-1, 1, size)`` meshgrid
    (styledecoder.py:404-406): grid[..., 0] = x varies along W,
    grid[..., 1] = y varies along H.

    Built in NUMPY (cached) so inside jit it traces as a literal
    constant: the jnp linspace/meshgrid form was re-COMPUTED on device
    every decode chunk (~1.3 ms/chunk of kLoop fusions at 512², XLA's
    constant folding stops below that size)."""
    return jnp.asarray(_identity_grid_np(size, jnp.dtype(dtype).name))


def _axis_weights(i0, frac, size):
    """Bilinear weights remapped onto the 2 clamped patch positions.

    Returns (start, w0, w1): patch start = clip(i0, 0, size-2); w_k is the
    weight of patch position start+k, accounting for out-of-range taps
    (zero padding) and the clamp shift.
    """
    start = jnp.clip(i0, 0, size - 2)
    v0 = (i0 >= 0) & (i0 < size)           # validity of tap i0
    v1 = (i0 + 1 >= 0) & (i0 + 1 < size)   # validity of tap i0+1
    w_tap0 = jnp.where(v0, 1.0 - frac, 0.0)
    w_tap1 = jnp.where(v1, frac, 0.0)

    def w_at(k):
        pos = start + k
        return (jnp.where(pos == i0, w_tap0, 0.0)
                + jnp.where(pos == i0 + 1, w_tap1, 0.0))

    return start, w_at(0), w_at(1)


_PATCH_DNUMS = lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

# Warp dispatch.  Two Pallas kernels exist as alternatives to the XLA
# patch gather:
#   - pallas/shift_warp_kernel: static-shift form, exact for |Δ| <= D with
#     a cond-gather fixup.  ISOLATED it beats the gather 6.8x at 128² and
#     1.7x at 256² (not at 512²: misaligned-sublane slice rotates), but
#     IN-GRAPH the gather's surrounding transposes fuse away while a
#     pallas_call is a fusion barrier, erasing the win (measured 208 vs
#     194 ms per 16-frame chunk).  Net: OFF by default until the
#     transpose-free NHWC-native synthesis lands (round-2 roadmap).
#   - experiments/pallas_warp_selection_matmul.py (off the import path):
#     windowed weighted-selection matmul — measured slower, kept as analysis.
_USE_PALLAS = False
_SHIFT_MAX_H = 256      # levels above this use the XLA gather
_SHIFT_MAX_DISP = 3     # displacement bound before the exact fixup runs


def set_pallas_warp(enabled: bool, max_h: int = 256, max_disp: int = 3) -> None:
    global _USE_PALLAS, _SHIFT_MAX_H, _SHIFT_MAX_DISP
    _USE_PALLAS = enabled
    _SHIFT_MAX_H = max_h
    _SHIFT_MAX_DISP = max_disp


def grid_sample_bilinear(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Dispatcher: Pallas static-shift kernel on TPU-friendly shapes/dtypes,
    XLA patch-gather otherwise (see grid_sample_bilinear_xla)."""
    if _USE_PALLAS and feat.shape[2] <= _SHIFT_MAX_H:
        try:
            from .pallas.shift_warp_kernel import (
                supports, warp_bilinear_shift_pallas)
            if supports(feat.shape, grid.shape, feat.dtype):
                return warp_bilinear_shift_pallas(feat, grid,
                                                  max_disp=_SHIFT_MAX_DISP)
        except ImportError:
            pass
    return grid_sample_bilinear_xla(feat, grid)


def grid_sample_bilinear_xla(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (B, C, H, W) at ``grid`` (B, Ho, Wo, 2) normalized xy.

    Returns (B, C, Ho, Wo).  Out-of-bounds taps contribute zero
    (padding_mode='zeros'), coordinates follow align_corners=False:
    pixel_center = ((g + 1) * size - 1) / 2.
    """
    b, c, h, w = feat.shape
    ho, wo = grid.shape[1], grid.shape[2]
    p = ho * wo
    gx = grid[..., 0].reshape(b, p).astype(jnp.float32)
    gy = grid[..., 1].reshape(b, p).astype(jnp.float32)

    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    tx = fx - x0f
    ty = fy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    ys, wy0, wy1 = _axis_weights(y0, ty, h)
    xs, wx0, wx1 = _axis_weights(x0, tx, w)

    # one gather per pixel: (2, 2, C) patch at (ys, xs), channels-last
    fcl = jnp.transpose(feat, (0, 2, 3, 1))                      # (B, H, W, C)

    def per_item(f, y, x):
        idx = jnp.stack([y, x], axis=-1)                         # (P, 2)
        return lax.gather(f, idx, _PATCH_DNUMS, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.CLIP)       # (P, 2, 2, C)

    patches = jax.vmap(per_item)(fcl, ys, xs)                    # (B, P, 2, 2, C)

    wy0 = wy0.astype(feat.dtype)[..., None]
    wy1 = wy1.astype(feat.dtype)[..., None]
    wx0 = wx0.astype(feat.dtype)[..., None]
    wx1 = wx1.astype(feat.dtype)[..., None]

    out = (patches[:, :, 0, 0] * (wy0 * wx0)
           + patches[:, :, 0, 1] * (wy0 * wx1)
           + patches[:, :, 1, 0] * (wy1 * wx0)
           + patches[:, :, 1, 1] * (wy1 * wx1))                  # (B, P, C)
    return jnp.transpose(out.reshape(b, ho, wo, c), (0, 3, 1, 2))
