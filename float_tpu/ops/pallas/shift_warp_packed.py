"""Frame-lane-packed static-shift warp for low-channel levels.

At the 512² synthesis level the feature map has only 32 channels, so the
plain shift kernel wastes 4x of the 128-lane datapath on padding.  But the
*warped operand is the same encoder feature map for every frame* — only
the flows differ — so 4 frames pack into the lane dimension:

    window lanes = [frame0 c0..31 | frame1 c0..31 | frame2 | frame3]
    (the shared feat is lane-tiled 4x; weights differ per lane group)

Per tap, the per-frame hat weights are expanded to lanes with 4 masked
selects against a lane-group iota; the window DMA is shared by all 4
frames.  Removes the 4x pad waste and amortizes DMA 4x.

Exactness: same hat-weight math as shift_warp_kernel; out-of-bound
displacements are fixed up by the caller via the usual cond-gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, TC = 8, 128        # TR=16 blows the VMEM stack (6 concurrent lane-
                       # expanded f32 weight temps in the dx unroll)
MARGIN = 8
WR, WC = TR + 2 * MARGIN, TC + 2 * MARGIN
GROUPS = 4                       # frames packed into lanes
CG = 128 // GROUPS               # channels per group


def _kernel(gy_ref, gx_ref, feat_hbm, out_ref, win, sem, *, h, w, d, out_dtype):
    i = pl.program_id(1)
    j = pl.program_id(2)

    rs = pl.multiple_of(i * TR, 8)
    cs = pl.multiple_of(j * TC, 8)
    # feat is SHARED across frames: batch/grid index b is not used
    dma = pltpu.make_async_copy(
        feat_hbm.at[0, pl.ds(rs, WR), pl.ds(cs, WC)], win, sem)
    dma.start()

    r_abs = (i * TR + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
             ).astype(jnp.float32)
    c_abs = (j * TC + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
             ).astype(jnp.float32)
    laneg = jax.lax.broadcasted_iota(jnp.int32, (TR, TC, 128), 2) // CG

    fys = []
    fxs = []
    for g in range(GROUPS):
        gy = gy_ref[0, g].astype(jnp.float32)
        gx = gx_ref[0, g].astype(jnp.float32)
        fys.append(((gy + 1.0) * h - 1.0) * 0.5)
        fxs.append(((gx + 1.0) * w - 1.0) * 0.5)

    dma.wait()

    n_taps = 2 * d + 2

    # horizontal lane-expanded weights are dy-independent: build the
    # (2d+2) fields ONCE per tile (the per-tap rebuild dominated runtime)
    wx_fields = []
    for dx in range(-d, d + 2):
        tap_x = c_abs + dx
        valid_x = (tap_x >= 0) & (tap_x < w)
        wx_l = jnp.zeros((TR, TC, 128), jnp.float32)
        for g in range(GROUPS):
            wx_g = jnp.maximum(0.0, 1.0 - jnp.abs(fxs[g] - tap_x))
            wx_g = jnp.where(valid_x, wx_g, 0.0)
            wx_l = jnp.where(laneg == g, wx_g[:, :, None], wx_l)
        wx_fields.append(wx_l)

    def body(t, acc):
        dy = t - d
        tap_y = r_abs + dy.astype(jnp.float32)
        valid_y = (tap_y >= 0) & (tap_y < h)
        # lane-expanded vertical weights: per group 1 select
        wy_l = jnp.zeros((TR, TC, 128), jnp.float32)
        for g in range(GROUPS):
            wy_g = jnp.maximum(0.0, 1.0 - jnp.abs(fys[g] - tap_y))
            wy_g = jnp.where(valid_y, wy_g, 0.0)
            wy_l = jnp.where(laneg == g, wy_g[:, :, None], wy_l)
        row_block = win[pl.ds(MARGIN + dy, TR)]              # (TR, WC, 128)
        for dx_i, dx in enumerate(range(-d, d + 2)):
            sl = row_block[:, MARGIN + dx: MARGIN + dx + TC, :]
            acc = acc + (wy_l * wx_fields[dx_i]) * sl.astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, n_taps, body,
                            jnp.zeros((TR, TC, 128), jnp.float32))
    out_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("d",))
def _packed_warp(feat_tiled, gy4, gx4, d: int):
    """feat_tiled (1, H+16, W+16, 128) lane-tiled shared feat;
    gy4/gx4 (B4, 4, H, W) -> (B4, H, W, 128)."""
    b4 = gy4.shape[0]
    hp, wp = feat_tiled.shape[1], feat_tiled.shape[2]
    h, w = hp - 2 * MARGIN, wp - 2 * MARGIN
    out_dtype = feat_tiled.dtype

    kern = functools.partial(_kernel, h=h, w=w, d=d, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=(b4, h // TR, w // TC),
        in_specs=[
            pl.BlockSpec((1, GROUPS, TR, TC), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUPS, TR, TC), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TR, TC, 128), lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b4, h, w, 128), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((WR, WC, 128), feat_tiled.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b4 * h * w * 128 * (2 * d + 2) ** 2,
            bytes_accessed=b4 * h * w * 128 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(gy4, gx4, feat_tiled)


def warp_shared_feat_packed(feat1_nhwc: jnp.ndarray, grid: jnp.ndarray,
                            max_disp: int = 3) -> jnp.ndarray:
    """Warp ONE shared feature map (1, H, W, C<=32) with B per-frame grids
    (B, H, W, 2), B % 4 == 0.  Returns (B, H, W, C) NHWC.  Exact via
    cond-gather fixup."""
    from ..nhwc import grid_sample_bilinear_nhwc
    from .shift_warp_kernel import _overflow_mask

    _, h, w, c = feat1_nhwc.shape
    b = grid.shape[0]
    assert b % GROUPS == 0 and c <= CG, (b, c)
    gy = grid[..., 1]
    gx = grid[..., 0]

    fpad = feat1_nhwc if c == CG else jnp.pad(
        feat1_nhwc, ((0, 0), (0, 0), (0, 0), (0, CG - c)))
    ftile = jnp.tile(fpad, (1, 1, 1, GROUPS))               # (1, H, W, 128)
    ftile = jnp.pad(ftile, ((0, 0), (MARGIN, MARGIN), (MARGIN, MARGIN),
                            (0, 0)))
    gy4 = gy.reshape(b // GROUPS, GROUPS, h, w)
    gx4 = gx.reshape(b // GROUPS, GROUPS, h, w)

    packed = _packed_warp(ftile, gy4, gx4, max_disp)        # (B4, H, W, 128)
    out = packed.reshape(b // GROUPS, h, w, GROUPS, CG)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, h, w, CG)[..., :c]

    overflow = _overflow_mask(h, w, gy, gx, max_disp)

    def fix(o):
        feat_b = jnp.broadcast_to(feat1_nhwc, (b,) + feat1_nhwc.shape[1:])
        exact = grid_sample_bilinear_nhwc(feat_b, grid)
        return jnp.where(overflow[..., None], exact, o)

    return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, out)
