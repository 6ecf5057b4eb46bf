"""Generalized frame-lane-packed static-shift warp (v2).

The decode-path warp: ONE shared encoder feature map per level, B per-frame
flow grids (reference op: grid_sample, zeros padding, align_corners=False —
/root/reference/src/nodes/models/float/styledecoder.py:423).  Bilinear
sampling with per-pixel displacement |Δ| <= D is an exact sum over
(2D+2)² static taps with hat weights; this kernel evaluates it in VMEM.

Improvements over round-1's shift_warp_packed/shift_warp_kernel:

- GROUPS ∈ {1, 2, 4}: levels with C = 128 / 64 / 32 channels pack 1 / 2 / 4
  frames into the 128-lane datapath (the shared feat is lane-tiled), so the
  256² level (C=64) stops wasting half its lanes and every level runs with
  full lane occupancy.
- dx-OUTER tap loop over whole-window column slices: ONE misaligned-sublane
  slice (the expensive rotate) of the (WR, TC, 128) window per dx instead of
  one per (dy, dx) tap — (2D+2)× fewer rotated rows.  The dy loop then
  slices the leading (untiled) dim, which takes arbitrary offsets for free.
- hoisted lane-expanded weight fields for BOTH axes (wy per dy, wx per dx),
  built once per tile via per-group lane masks: field = Σ_g w_g ⊗ mask_g
  (lane-splat FMAs, no per-tap selects).  Per tap only 2 FMAs remain.
- parametric D: taps = (2D+2)²; the decode loop probes the clip's real flow
  magnitudes and dispatches the smallest safe D (runtime-adaptive; see
  runtime/decode.py).  Exactness for flows beyond D comes from the caller's
  cond-gather fixup, as before.
- window DMA cached across frames: grid iterates frame-groups innermost and
  re-DMAs the (shared) window only when the tile changes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TC = 128
MARGIN = 8                     # supports D <= 7


def _hat_fields_at(fs, base_abs, size, off, groups):
    """Per-group hat weights at one tap offset: list of (TR, TC) f32."""
    tap = base_abs + off
    valid = (tap >= 0) & (tap < size)
    return [jnp.where(valid, jnp.maximum(0.0, 1.0 - jnp.abs(fs[g] - tap)),
                      0.0) for g in range(groups)]


def _kernel(gy_ref, gx_ref, feat_hbm, out_ref, win, win_rot, sem,
            *, h, w, d, groups, tr, out_dtype):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bg = pl.program_id(2)

    wr = tr + 2 * MARGIN
    wc = TC + 2 * MARGIN
    n_taps = 2 * d + 2

    # The window is SHARED by all frame-groups of this tile: DMA once and
    # pre-rotate the n_taps column slices once (the misaligned-sublane
    # slice is the expensive op — cached in scratch, it is paid once per
    # TILE instead of once per (tap, frame-group)).
    @pl.when(bg == 0)
    def _copy():
        rs = pl.multiple_of(i * tr, 8)
        cs = pl.multiple_of(j * TC, 8)
        dma = pltpu.make_async_copy(
            feat_hbm.at[0, pl.ds(rs, wr), pl.ds(cs, wc)], win, sem)
        dma.start()
        dma.wait()
        for dx_i, dx in enumerate(range(-d, d + 2)):
            win_rot[dx_i] = win[:, MARGIN + dx: MARGIN + dx + TC, :]

    r_abs = (i * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, TC), 0)
             ).astype(jnp.float32)
    c_abs = (j * TC + jax.lax.broadcasted_iota(jnp.int32, (tr, TC), 1)
             ).astype(jnp.float32)

    # per-group lane masks (1, 1, 128) — FMA lane expansion, no selects
    cg = 128 // groups
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    gmasks = [(lane // cg == g).astype(jnp.float32) for g in range(groups)]

    # per-group pixel-center coordinate fields
    fys, fxs = [], []
    for g in range(groups):
        gy = gy_ref[0, g].astype(jnp.float32)
        gx = gx_ref[0, g].astype(jnp.float32)
        fys.append(((gy + 1.0) * h - 1.0) * 0.5)
        fxs.append(((gx + 1.0) * w - 1.0) * 0.5)

    def lane_expand(smalls):
        """Σ_g smalls[g] ⊗ mask_g -> (tr, TC, 128) f32."""
        if groups == 1:
            return smalls[0][:, :, None]
        acc = smalls[0][:, :, None] * gmasks[0]
        for g in range(1, groups):
            acc = acc + smalls[g][:, :, None] * gmasks[g]
        return acc

    # hoist the lane-expanded horizontal fields (n_taps f32 temps); the
    # vertical field is rebuilt per fori step (bounded liveness)
    wx_fields = [
        lane_expand(_hat_fields_at(fxs, c_abs, w, dx, groups))
        for dx in range(-d, d + 2)
    ]

    def body(t, acc):
        dyf = (t - d).astype(jnp.float32)
        tap_y = r_abs + dyf
        valid_y = (tap_y >= 0) & (tap_y < h)
        wy_l = lane_expand([
            jnp.where(valid_y,
                      jnp.maximum(0.0, 1.0 - jnp.abs(fys[g] - tap_y)), 0.0)
            for g in range(groups)])
        # rows of all n_taps pre-rotated windows at vertical tap t
        rows = win_rot[:, pl.ds(MARGIN - d + t, tr)]  # (n_taps, tr, TC, 128)
        for dx_i in range(n_taps):
            acc = acc + (wy_l * wx_fields[dx_i]) * \
                rows[dx_i].astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, n_taps, body,
                            jnp.zeros((tr, TC, 128), jnp.float32))
    out_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("d", "groups", "tr"))
def _packed_warp_v2(feat_tiled, gyg, gxg, d: int, groups: int, tr: int):
    """feat_tiled (1, H+2M, W+2M, 128) lane-tiled shared feat;
    gyg/gxg (B//groups, groups, H, W) -> (B//groups, H, W, 128)."""
    nbg = gyg.shape[0]
    hp, wp = feat_tiled.shape[1], feat_tiled.shape[2]
    h, w = hp - 2 * MARGIN, wp - 2 * MARGIN
    out_dtype = feat_tiled.dtype
    wr, wc = tr + 2 * MARGIN, TC + 2 * MARGIN

    kern = functools.partial(_kernel, h=h, w=w, d=d, groups=groups, tr=tr,
                             out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=(h // tr, w // TC, nbg),
        in_specs=[
            pl.BlockSpec((1, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tr, TC, 128), lambda i, j, b: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nbg, h, w, 128), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((wr, wc, 128), feat_tiled.dtype),
            pltpu.VMEM((2 * d + 2, wr, TC, 128), feat_tiled.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nbg * h * w * 128 * (2 * d + 2) ** 2,
            bytes_accessed=nbg * h * w * 128 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # frame-groups innermost and in-order so the cached window in
            # scratch stays valid for bg > 0
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(gyg, gxg, feat_tiled)


def pick_groups(c: int, b: int) -> int:
    """Largest lane-packing factor the level supports."""
    for g in (4, 2, 1):
        if c * g <= 128 and b % g == 0:
            return g
    return 1


def warp_shared_feat_v2(feat1_nhwc: jnp.ndarray, grid: jnp.ndarray,
                        max_disp: int = 3, tr: int = 8) -> jnp.ndarray:
    """Warp ONE shared feature map (1, H, W, C) with B per-frame grids
    (B, H, W, 2) -> (B, H, W, C) NHWC.  Exact for arbitrary flows via the
    cond-gather fixup beyond ``max_disp``."""
    from ..nhwc import grid_sample_bilinear_nhwc
    from .shift_warp_kernel import _overflow_mask

    assert max_disp <= MARGIN - 1, (max_disp, MARGIN)
    _, h, w, c = feat1_nhwc.shape
    b = grid.shape[0]
    groups = pick_groups(c, b)
    cg = 128 // groups
    gy = grid[..., 1]
    gx = grid[..., 0]

    fpad = feat1_nhwc if c == cg else jnp.pad(
        feat1_nhwc, ((0, 0), (0, 0), (0, 0), (0, cg - c)))
    ftile = fpad if groups == 1 else jnp.tile(fpad, (1, 1, 1, groups))
    ftile = jnp.pad(ftile, ((0, 0), (MARGIN, MARGIN), (MARGIN, MARGIN),
                            (0, 0)))
    gyg = gy.reshape(b // groups, groups, h, w)
    gxg = gx.reshape(b // groups, groups, h, w)

    packed = _packed_warp_v2(ftile, gyg, gxg, max_disp, groups, tr)
    out = packed.reshape(b // groups, h, w, groups, cg)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, h, w, cg)[..., :c]

    overflow = _overflow_mask(h, w, gy, gx, max_disp)

    def fix(o):
        feat_b = jnp.broadcast_to(feat1_nhwc, (b,) + feat1_nhwc.shape[1:])
        exact = grid_sample_bilinear_nhwc(feat_b, grid)
        return jnp.where(overflow[..., None], exact, o)

    return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, out)
