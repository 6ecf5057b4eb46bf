"""Pallas TPU kernel: static-shift bilinear warp (bounded displacement).

The fast exact warp for realistic flows.  For same-size warps with
per-pixel displacement |Δ| <= D, bilinear sampling is a sum over
(2D+2)² *static* taps with per-pixel hat weights (see ops/warp_shifts.py
for the math).  This kernel evaluates that sum entirely in VMEM:

  - feat is edge-padded by a fixed margin (8) in H/W by the wrapper, so
    every (8, 128)-pixel output tile reads one aligned (24, 144, CB)
    halo window — static-size DMA, no gather, no selection matmuls;
  - per tap (dy, dx): hat weights wy*wx on the VPU, one fused
    multiply-accumulate against a statically-offset window slice;
  - cost ≈ (2D+2)² VPU FMAs per pixel-channel — measured >4x faster than
    the XLA gather at the 512² level (the gather is ~27 ns/index).

Out-of-bound displacements are fixed up exactly through the XLA gather
path under a lax.cond, as in warp_kernel.py.  Requires D <= 7.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, TC = 16, 128           # taller tiles amortize per-tile DMA/loop overhead
                           # (TC>128 makes the dx-unroll temps blow VMEM)
MARGIN = 8                 # fixed halo; supports D <= 7
WR, WC = TR + 2 * MARGIN, TC + 2 * MARGIN


def _kernel(gy_ref, gx_ref, feat_hbm, out_ref, win, sem,
            *, h, w, cb, d, out_dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    kc = pl.program_id(3)

    # padded-coords window start: always in range, 8-aligned
    rs = pl.multiple_of(i * TR, 8)
    cs = pl.multiple_of(j * TC, 8)
    dma = pltpu.make_async_copy(
        feat_hbm.at[b, pl.ds(rs, WR), pl.ds(cs, WC),
                    pl.ds(kc * cb, cb)],
        win, sem)
    dma.start()

    # absolute output pixel coordinates (unpadded image space)
    r_abs = (i * TR + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
             ).astype(jnp.float32)
    c_abs = (j * TC + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
             ).astype(jnp.float32)

    gy = gy_ref[0].astype(jnp.float32)
    gx = gx_ref[0].astype(jnp.float32)
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    fx = ((gx + 1.0) * w - 1.0) * 0.5

    dma.wait()

    n_taps = 2 * d + 2

    # fori over dy (dim 0 of the window is untiled: arbitrary dynamic
    # offsets are fine); static unroll over dx (sublane dim: dynamic
    # offsets would need 8-alignment, static misaligned slices are fine).
    # A fully unrolled 2-D tap loop stacks ~36 concurrent (TR,TC,CB)
    # temporaries and blows the VMEM stack.
    def body(t, acc):
        dy = t - d
        tap_y = r_abs + dy.astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - tap_y))
        wy = jnp.where((tap_y >= 0) & (tap_y < h), wy, 0.0)
        row_block = win[pl.ds(MARGIN + dy, TR)]                # (TR, WC, CB)
        for dx in range(-d, d + 2):
            tap_x = c_abs + dx
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - tap_x))
            wx = jnp.where((tap_x >= 0) & (tap_x < w), wx, 0.0)
            wgt = (wy * wx)[:, :, None]                        # (TR, TC, 1)
            sl = row_block[:, MARGIN + dx: MARGIN + dx + TC, :]
            acc = acc + wgt * sl.astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, n_taps, body,
                            jnp.zeros((TR, TC, cb), jnp.float32))
    out_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("d",))
def _shift_warp_nhwc(feat_padded, gy, gx, d: int):
    """feat_padded (B, H+16, W+16, C>=128-padded); gy/gx (B, H, W)."""
    b, hp, wp, c = feat_padded.shape
    h, w = hp - 2 * MARGIN, wp - 2 * MARGIN
    cb = min(c, 128)
    out_dtype = feat_padded.dtype

    grid = (b, h // TR, w // TC, c // cb)
    kern = functools.partial(_kernel, h=h, w=w, cb=cb, d=d,
                             out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TR, TC), lambda b, i, j, k: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TC), lambda b, i, j, k: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TR, TC, cb), lambda b, i, j, k: (b, i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((WR, WC, cb), feat_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (2 * d + 2) ** 2,
            bytes_accessed=b * h * w * c * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "parallel"),
        ),
    )(gy, gx, feat_padded)


def _overflow_mask(h, w, gy, gx, d):
    """(B, H, W) bool: any in-image tap beyond displacement D."""
    from ..nhwc import floor_disp_fields
    dy, dx, relevant = floor_disp_fields(gy, gx, h, w)
    return ((dy > d) | (dx > d)) & relevant


def warp_bilinear_shift_pallas(feat_nchw: jnp.ndarray, grid: jnp.ndarray,
                               max_disp: int = 3) -> jnp.ndarray:
    """Drop-in grid_sample_bilinear; exact for arbitrary flows (cond-gather
    fixup beyond max_disp)."""
    from ..warp import grid_sample_bilinear_xla

    assert max_disp <= MARGIN - 1, f"max_disp {max_disp} > {MARGIN - 1}"
    b, c, h, w = feat_nchw.shape
    gy = grid[..., 1]
    gx = grid[..., 0]

    feat_cl = jnp.transpose(feat_nchw, (0, 2, 3, 1))
    if c < 128:
        feat_cl = jnp.pad(feat_cl, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
    feat_p = jnp.pad(feat_cl, ((0, 0), (MARGIN, MARGIN), (MARGIN, MARGIN),
                               (0, 0)))
    out_cl = _shift_warp_nhwc(feat_p, gy, gx, max_disp)[..., :c]
    out = jnp.transpose(out_cl, (0, 3, 1, 2))

    overflow = _overflow_mask(h, w, gy, gx, max_disp)

    def fix(o):
        exact = grid_sample_bilinear_xla(feat_nchw, grid)
        return jnp.where(overflow[:, None, :, :], exact, o)

    return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, out)


def supports(feat_shape, grid_shape, dtype) -> bool:
    b, c, h, w = feat_shape
    return (dtype == jnp.bfloat16 and h >= 128 and w >= 128
            and h % TR == 0 and w % TC == 0
            and grid_shape[1] == h and grid_shape[2] == w)
