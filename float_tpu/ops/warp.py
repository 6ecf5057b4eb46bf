"""Bilinear grid sampling (flow warping) — torch ``F.grid_sample`` parity.

Semantics matched: bilinear, ``padding_mode='zeros'``, ``align_corners=False``
(reference usage: src/nodes/models/float/styledecoder.py:423).

TPU-native formulation: instead of 4 gathers (scatter/gather is the slowest
path on TPU), the sample is decomposed per-axis — a gather along W then a
gather along H — using ``jnp.take_along_axis`` with contiguous index tensors,
which XLA lowers to dynamic-slice-friendly ops.  For the small feature maps
in the Synthesis pyramid this is already memory-bound-optimal; a Pallas
variant can pin everything in VMEM later.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def identity_grid(size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) identity sampling grid in [-1, 1], xy order.

    Matches the reference's ``np.linspace(-1, 1, size)`` meshgrid
    (styledecoder.py:404-406): grid[..., 0] = x varies along W,
    grid[..., 1] = y varies along H.
    """
    xs = jnp.linspace(-1.0, 1.0, size, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, xs)          # both (H, W); gx varies along axis 1
    return jnp.stack([gx, gy], axis=-1)


def grid_sample_bilinear(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (B, C, H, W) at ``grid`` (B, Ho, Wo, 2) normalized xy.

    Returns (B, C, Ho, Wo).  Out-of-bounds taps contribute zero
    (padding_mode='zeros'), coordinates follow align_corners=False:
    pixel_center = ((g + 1) * size - 1) / 2.
    """
    b, c, h, w = feat.shape
    ho, wo = grid.shape[1], grid.shape[2]
    gx = grid[..., 0].reshape(b, -1)        # (B, P) with P = Ho*Wo
    gy = grid[..., 1].reshape(b, -1)

    fx = ((gx + 1.0) * w - 1.0) * 0.5       # float pixel coords
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0).astype(feat.dtype)[..., None]       # (B, P, 1)
    ty = (fy - y0).astype(feat.dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    # validity masks for zero padding
    vx0 = (x0i >= 0) & (x0i < w)
    vx1 = (x1i >= 0) & (x1i < w)
    vy0 = (y0i >= 0) & (y0i < h)
    vy1 = (y1i >= 0) & (y1i < h)

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    # Channels-last flat gather: operand (HW, C) rows are contiguous in the
    # lane dimension, index tensor is only (B, P) — no broadcast over C/H
    # (a take_along_axis formulation would materialise a (B,C,H,P) index
    # tensor: tens of GiB at 512²).
    fcl = jnp.transpose(feat, (0, 2, 3, 1)).reshape(b, h * w, c)
    take = jax.vmap(lambda o, i: jnp.take(o, i, axis=0))

    def tap(yc, xc, valid):
        vals = take(fcl, yc * w + xc)                   # (B, P, C)
        return jnp.where(valid[..., None], vals, 0)

    f00 = tap(y0c, x0c, vx0 & vy0)
    f01 = tap(y1c, x0c, vx0 & vy1)
    f10 = tap(y0c, x1c, vx1 & vy0)
    f11 = tap(y1c, x1c, vx1 & vy1)

    top = f00 * (1 - tx) + f10 * tx
    bot = f01 * (1 - tx) + f11 * tx
    out = top * (1 - ty) + bot * ty                     # (B, P, C)
    return jnp.transpose(out.reshape(b, ho, wo, c), (0, 3, 1, 2))
