"""Pallas TPU kernel: windowed bilinear warp (grid_sample).

Why: XLA:TPU lowers arbitrary gathers to a per-index path (~35 ns/index
measured on v5e), which makes flow-warping the dominant cost of the whole
synthesis decoder.  This kernel reformulates the warp as MXU work:

  For each (8, 128) output tile, DMA an input window
  (WR = 8+2·MY rows, WC = 128+2·MX cols, CB channels) into VMEM.  The
  bilinear sample is a weighted selection: build the horizontal weight
  matrix WX (1024 px, WC) — two nonzeros per row, (1-tx) and tx at the two
  source columns — ONCE per tile, then accumulate over window rows r:

      acc[p, c] += wy_r[p] * (WX @ win[r])[p, c]

  i.e. WR small matmuls on the MXU plus a per-row vertical weight.  Taps
  outside the image contribute zero (padding parity); taps outside the
  *window* are detected host-side (cheap elementwise on indices) and fixed
  up exactly with the XLA gather path under a lax.cond, so the result is
  exact for arbitrary flows and fast for realistic ones.

Used for levels >= 128² in bf16; smaller levels and f32 parity runs use
the XLA patch-gather path (ops/warp.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, TC = 8, 128          # output tile (rows, cols)


def _kernel(gy_ref, gx_ref, feat_hbm, out_ref, win, sem,
            *, h, w, c, cb, my, mx, wr, wc, out_dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    kc = pl.program_id(3)

    # starts stay multiples of 8 (TR=8; margins and clamp bounds are chosen
    # as multiples of 8); the hint lets Mosaic prove DMA slice alignment
    # against the (8, 128) HBM tiling of the last two dims.
    rs = pl.multiple_of(jnp.clip(i * TR - my, 0, h - wr), 8)
    cs = pl.multiple_of(jnp.clip(j * TC - mx, 0, w - wc), 8)

    if cb == c:
        # full channel dim: no C slicing (sub-128 slices are not
        # representable against the lane tiling)
        src = feat_hbm.at[b, pl.ds(rs, wr), pl.ds(cs, wc)]
    else:
        src = feat_hbm.at[b, pl.ds(rs, wr), pl.ds(cs, wc), pl.ds(kc * cb, cb)]
    dma = pltpu.make_async_copy(src, win, sem)
    dma.start()

    # window-column iota, shared across output rows: (WC, TC)
    q = jax.lax.broadcasted_iota(jnp.int32, (wc, TC), 0) + cs
    dma.wait()

    # one output row at a time: every per-pixel quantity stays (1, TC) and
    # broadcasts against (WC, TC) — no sublane<->lane reshapes (which
    # Mosaic cannot lower).
    for oi in range(TR):
        gy = gy_ref[0, oi:oi + 1, :].astype(jnp.float32)      # (1, TC)
        gx = gx_ref[0, oi:oi + 1, :].astype(jnp.float32)
        fy = ((gy + 1.0) * h - 1.0) * 0.5
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        y0f = jnp.floor(fy)
        x0f = jnp.floor(fx)
        ty = fy - y0f
        tx = fx - x0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        vx0 = (x0 >= 0) & (x0 < w)
        vx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
        # transposed horizontal weights (WC, TC): 2 nonzeros per column
        wxt = (jnp.where((q == x0) & vx0, 1.0 - tx, 0.0)
               + jnp.where((q == x0 + 1) & vx1, tx, 0.0))     # (WC, TC) f32

        vy0 = ((y0 >= 0) & (y0 < h)).astype(jnp.float32)
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(jnp.float32)
        wy_tap0 = (1.0 - ty) * vy0                            # (1, TC)
        wy_tap1 = ty * vy1

        def body(r, acc, wxt=wxt, y0=y0, wy_tap0=wy_tap0, wy_tap1=wy_tap1):
            row = rs + r
            wy = (jnp.where(row == y0, wy_tap0, 0.0)
                  + jnp.where(row == y0 + 1, wy_tap1, 0.0))   # (1, TC)
            sel = (wxt * wy).astype(out_dtype)                # (WC, TC)
            # contract over WC: out (TC, CB)
            return acc + jax.lax.dot_general(
                sel, win[r],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, wr, body,
                                jnp.zeros((TC, cb), jnp.float32))
        out_ref[0, oi] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("my", "mx"))
def _warp_pallas_nhwc(feat, gy, gx, my: int, mx: int):
    """feat (B, H, W, C) -> warped (B, H, W, C); window margins my/mx."""
    b, h, w, c = feat.shape
    cb = min(c, 128)
    wr = min(h, TR + 2 * my)
    wc = min(w, TC + 2 * mx)
    out_dtype = feat.dtype

    grid = (b, h // TR, w // TC, c // cb)
    kern = functools.partial(_kernel, h=h, w=w, c=c, cb=cb, my=my, mx=mx,
                             wr=wr, wc=wc, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TR, TC), lambda b, i, j, k: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TC), lambda b, i, j, k: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, TR, TC, cb), lambda b, i, j, k: (b, i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((wr, wc, cb), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // TR) * (w // TC) * (c // cb) * wr * TR * TC * wc * cb,
            bytes_accessed=b * h * w * c * 4,
            transcendentals=0,
        ),
    )(gy, gx, feat)


def _overflow_mask(h, w, gy, gx, my, mx):
    """(B, H, W) bool: any in-image tap falls outside the DMA window."""
    bsz = gy.shape[0]
    fy = ((gy.astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    fx = ((gx.astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)

    wr = min(h, TR + 2 * my)
    wc = min(w, TC + 2 * mx)
    i = jnp.arange(h, dtype=jnp.int32)[None, :, None] // TR
    j = jnp.arange(w, dtype=jnp.int32)[None, None, :] // TC
    rs = jnp.clip(i * TR - my, 0, h - wr)
    cs = jnp.clip(j * TC - mx, 0, w - wc)

    def bad(t, lo, size, win_size):
        valid = (t >= 0) & (t < size)
        return valid & ((t < lo) | (t >= lo + win_size))

    oy = bad(y0, rs, h, wr) | bad(y0 + 1, rs, h, wr)
    ox = bad(x0, cs, w, wc) | bad(x0 + 1, cs, w, wc)
    return oy | ox


def warp_bilinear_pallas(feat_nchw: jnp.ndarray, grid: jnp.ndarray,
                         my: int = 8, mx: int = 64) -> jnp.ndarray:
    """Drop-in grid_sample_bilinear with the Pallas windowed kernel.

    feat (B, C, H, W), grid (B, H, W, 2) normalized xy (same spatial size).
    Exact: out-of-window pixels are corrected with the XLA gather path under
    a lax.cond that only runs when overflow actually occurs.
    """
    from ..warp import grid_sample_bilinear_xla

    b, c, h, w = feat_nchw.shape
    gy = grid[..., 1]
    gx = grid[..., 0]
    feat_cl = jnp.transpose(feat_nchw, (0, 2, 3, 1))
    if c < 128:
        # sub-128 channel slices can't be DMA'd against the lane tiling;
        # pad to a full lane (the MXU runs N<128 at N=128 speed anyway, so
        # this only costs DMA bandwidth).
        feat_cl = jnp.pad(feat_cl, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
    out_cl = _warp_pallas_nhwc(feat_cl, gy, gx, my, mx)[..., :c]
    out = jnp.transpose(out_cl, (0, 3, 1, 2))

    overflow = _overflow_mask(h, w, gy, gx, my, mx)

    def fix(o):
        exact = grid_sample_bilinear_xla(feat_nchw, grid)
        return jnp.where(overflow[:, None, :, :], exact, o)

    return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, out)


def supports(feat_shape, grid_shape, dtype) -> bool:
    """Kernel applicability: bf16, square >=128, grid same size as feat."""
    b, c, h, w = feat_shape
    return (dtype == jnp.bfloat16 and h >= 128 and w >= 128
            and h % TR == 0 and w % TC == 0
            and grid_shape[1] == h and grid_shape[2] == w
            and c % min(c, 128) == 0)


# NOTE: this kernel lives in experiments/ (off the production import path).
# It is correct but measured SLOWER than both the XLA patch gather and the
# static-shift kernels (the one-hot selection construction is
# O(window_area x pixels) on the VPU) — see PERF.md "Warp kernel findings".
# Kept for the measured analysis and as MXU-reformulation groundwork.
