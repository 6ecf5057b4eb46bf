"""Channels-last (NHWC) variants of the synthesis ops.

The decode path runs NHWC end-to-end so the warp kernels receive their
native layout with no transposes around the pallas_call (a pallas_call is
a fusion barrier: in NCHW the XLA gather's transposes fuse into neighbors
while the kernel's cannot — measured conv-warp-conv in NHWC: shift kernel
4.5x faster than the gather at 256², 1.7x at 512²; see PERF.md).

Weights stay in torch layout (O, I, kH, kW) — lax convolutions take
arbitrary dimension numbers, so no weight re-layout is needed.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .activations import leaky_relu, LRELU_SCALE
from .equalized import equal_linear
from .upfirdn import make_blur_kernel
from .modulated import _EPS


def fused_leaky_relu_cl(x, bias, negative_slope=0.2, scale=LRELU_SCALE):
    """Bias broadcasts over the LAST (channel) dim."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return leaky_relu(x, negative_slope) * scale


def equal_conv2d_cl(x, weight, bias=None, stride=1, padding=0):
    """NHWC conv, weight (O, I, kH, kW) torch layout."""
    o, i, kh, kw = weight.shape
    w = (weight * (1.0 / math.sqrt(i * kh * kw))).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(x.dtype)
    return out


def upfirdn2d_cl(x, kernel, up=1, down=1, pad=(0, 0)):
    """NHWC depthwise upfirdn (same semantics as ops.upfirdn.upfirdn2d)."""
    pad0, pad1 = pad
    c = x.shape[-1]
    kh, kw = kernel.shape
    pad_hi = pad1 + (up - 1)
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (down, down), ((pad0, pad_hi), (pad0, pad_hi)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


# channels <= this use the band-matmul (MXU) upfirdn form; wider tensors
# keep the depthwise conv.  The depthwise form runs at C/128 lane
# occupancy on the VPU, so low-channel blurs (RGB/flow skip chains) are
# much faster as einsums on the otherwise-idle MXU.
MXU_BLUR_MAX_C = 15

# fold the up-modulated-conv's post-upsample blur into the conv kernel
# (one composed 6x6 conv instead of conv + depthwise blur + intermediate).
# Measured on chip: OFF wins e2e (304.1 vs 276.9 frames/s) — the composed
# kernel's 4x tap area costs more MXU time than the depthwise blur +
# intermediate it saves (XLA fuses the two-step form well).  Kept as an
# exact, test-covered alternative for future hardware where conv FLOPs
# are cheaper relative to bandwidth.
FUSE_UP_BLUR = False


def upsample2x_cl(x, blur_kernel=(1, 3, 3, 1)):
    """2x upsample.  Low-channel tensors (the 3-channel RGB / raw-flow
    skip chains) go through MXU band matmuls (upfirdn.upfirdn2d_mxu) —
    the depthwise-conv form runs at C/128 lane occupancy there; wide
    tensors keep the depthwise conv, which XLA fuses well in-graph."""
    factor = 2
    p = len(blur_kernel) - factor
    if x.shape[-1] <= MXU_BLUR_MAX_C:
        from .upfirdn import upfirdn2d_mxu
        return upfirdn2d_mxu(x, blur_kernel, up=factor, down=1,
                             pad=((p + 1) // 2 + factor - 1, p // 2),
                             kernel_gain=factor ** 2)
    kernel = make_blur_kernel(blur_kernel, upsample_factor=factor)
    return upfirdn2d_cl(x, kernel, up=factor, down=1,
                        pad=((p + 1) // 2 + factor - 1, p // 2))


def modulated_conv2d_cl(x, style, weight, mod_weight, mod_bias,
                        demodulate=True, up=False, blur_kernel=(1, 3, 3, 1)):
    """NHWC modulated conv (input/output-scaling form; see ops.modulated)."""
    b = x.shape[0]
    in_c = x.shape[-1]
    _, out_c, _, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)

    s = equal_linear(style, mod_weight, mod_bias)            # (B, I)
    w0 = weight[0]                                           # (O, I, kH, kW)

    if demodulate:
        w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
        sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
        demod = jax.lax.rsqrt(sig2 + _EPS)

    xm = x * (s * scale).astype(x.dtype)[:, None, None, :]
    cw = w0.astype(x.dtype)

    if up:
        wt = jnp.flip(cw, (2, 3))
        factor = 2
        p = (len(blur_kernel) - factor) - (kh - 1)
        pad = ((p + 1) // 2 + factor - 1, p // 2 + 1)
        if FUSE_UP_BLUR:
            # fold the post-upsample blur into the transposed-conv kernel:
            # two successive correlations compose into ONE whose kernel is
            # the full convolution of the two (pads add) — corr with the
            # blur's flipped kernel == corr composed with make_blur_kernel
            # directly.  Kills the (B, 2H+1, 2W+1, C) intermediate + the
            # depthwise blur pass per up-conv; the demod scalar commutes
            # with the (linear, per-channel) blur exactly.
            k2 = make_blur_kernel(blur_kernel, upsample_factor=factor)
            bk_h, bk_w = k2.shape
            o_c, i_c = wt.shape[0], wt.shape[1]
            wt_f = wt.reshape(o_c * i_c, 1, kh, kw).astype(jnp.float32)
            comp = jax.lax.conv_general_dilated(
                wt_f, k2.astype(jnp.float32)[None, None], (1, 1),
                ((bk_h - 1, bk_h - 1), (bk_w - 1, bk_w - 1)),
                preferred_element_type=jnp.float32)
            comp = comp.reshape(o_c, i_c, kh + bk_h - 1,
                                kw + bk_w - 1).astype(x.dtype)
            out = jax.lax.conv_general_dilated(
                xm, comp, (1, 1),
                ((kh - 1 + pad[0], kh - 1 + pad[1]),
                 (kw - 1 + pad[0], kw - 1 + pad[1])),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            if demodulate:
                out = out * demod.astype(x.dtype)[:, None, None, :]
            return out
        out = jax.lax.conv_general_dilated(
            xm, wt, (1, 1), ((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        if demodulate:
            out = out * demod.astype(x.dtype)[:, None, None, :]
        if out.shape[-1] <= MXU_BLUR_MAX_C:
            from .upfirdn import upfirdn2d_mxu
            return upfirdn2d_mxu(out, blur_kernel, up=1, down=1, pad=pad,
                                 kernel_gain=factor ** 2)
        k = make_blur_kernel(blur_kernel, upsample_factor=factor)
        return upfirdn2d_cl(out, k, pad=pad)

    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        xm, cw, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if demodulate:
        out = out * demod.astype(x.dtype)[:, None, None, :]
    return out


# ---------------------------------------------------------------------------
# NHWC grid sampling
# ---------------------------------------------------------------------------

def grid_sample_bilinear_nhwc(feat, grid):
    """Exact NHWC bilinear sample (patch gather), zeros padding,
    align_corners=False.  feat (B, H, W, C), grid (B, Ho, Wo, 2) -> NHWC."""
    from jax import lax
    from .warp import _axis_weights, _PATCH_DNUMS

    b, h, w, c = feat.shape
    ho, wo = grid.shape[1], grid.shape[2]
    p = ho * wo
    gx = grid[..., 0].reshape(b, p).astype(jnp.float32)
    gy = grid[..., 1].reshape(b, p).astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - jnp.floor(fx)
    ty = fy - jnp.floor(fy)

    ys, wy0, wy1 = _axis_weights(y0, ty, h)
    xs, wx0, wx1 = _axis_weights(x0, tx, w)

    def per_item(f, y, x):
        idx = jnp.stack([y, x], axis=-1)
        return lax.gather(f, idx, _PATCH_DNUMS, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.CLIP)

    patches = jax.vmap(per_item)(feat, ys, xs)               # (B, P, 2, 2, C)
    wy0 = wy0.astype(feat.dtype)[..., None]
    wy1 = wy1.astype(feat.dtype)[..., None]
    wx0 = wx0.astype(feat.dtype)[..., None]
    wx1 = wx1.astype(feat.dtype)[..., None]
    out = (patches[:, :, 0, 0] * (wy0 * wx0)
           + patches[:, :, 0, 1] * (wy0 * wx1)
           + patches[:, :, 1, 0] * (wy1 * wx0)
           + patches[:, :, 1, 1] * (wy1 * wx1))
    return out.reshape(b, ho, wo, c)


def warp_cl(feat, grid, use_kernel: bool = True, max_disp: int = 2,
            shared_feat=None, apply_fixup: bool = True, path: str = "auto"):
    """NHWC warp dispatcher.

    The decode case (``shared_feat`` (1, H, W, C): one encoder map shared
    by all frames) routes to the generalized frame-lane-packed static-shift
    kernel (shift_warp_v2: GROUPS = 128//C frames packed into the lanes,
    window DMA + pre-rotated column slices cached across frames).  Per-frame
    feats use the plain shift kernel at 128²..256²; everything else takes
    the XLA patch gather.  All kernel paths are exact for arbitrary flows
    via the cond-gather fixup beyond ``max_disp``.

    ``apply_fixup=False`` (optimistic mode) returns (out, flags (2,) int32
    = [beyond-D overflow, max local spread]) instead: the beyond-D fixup
    cond is skipped and the caller re-runs flagged outputs with the fixup
    (see warp_shared_feat_v2); exact non-kernel paths report [0, -1]
    (no spread statistic).

    ``path`` ('auto' | 'fast3' | 'fast4' | 'fast5' | 'fast6', optimistic
    v2 levels only)
    selects the cond-free recentered fast path at trace time; an n-tap
    path is exact iff the reported spread <= n - 2 (the decode loop's path
    ratchet validates and re-decodes misses)."""
    b, h, w, c = feat.shape
    same_size = grid.shape[1] == h and grid.shape[2] == w
    if (use_kernel and same_size and feat.dtype == jnp.bfloat16
            and shared_feat is not None and h >= 128
            and c <= 128 and h % 8 == 0 and w % 128 == 0):
        from .pallas.shift_warp_v2 import warp_shared_feat_v2
        return warp_shared_feat_v2(shared_feat, grid, max_disp=max_disp,
                                   apply_fixup=apply_fixup,
                                   path=path if not apply_fixup else "auto")
    if (use_kernel and same_size and feat.dtype == jnp.bfloat16
            and 128 <= h <= 256 and w >= 128
            and h % 16 == 0 and w % 128 == 0):
        from .pallas.shift_warp_kernel import (
            MARGIN, _shift_warp_nhwc, _overflow_mask)
        gy = grid[..., 1]
        gx = grid[..., 0]
        fpad = feat if c >= 128 else jnp.pad(
            feat, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
        fpad = jnp.pad(fpad, ((0, 0), (MARGIN, MARGIN), (MARGIN, MARGIN),
                              (0, 0)))
        out = _shift_warp_nhwc(fpad, gy, gx, max_disp)[..., :c]
        if not apply_fixup:
            # optimistic mode exists to avoid per-pixel field costs: derive
            # the flag from the scalar displacement bound, not the full
            # (B, H, W) overflow mask (equivalent: both reduce
            # (dy>D | dx>D) & relevant over all pixels)
            flag = (flow_needed_disp(grid, h, w) > max_disp).astype(jnp.int32)
            return out, jnp.stack([flag, jnp.int32(-1)])   # no spread stat
        overflow = _overflow_mask(h, w, gy, gx, max_disp)

        def fix(o):
            exact = grid_sample_bilinear_nhwc(feat, grid)
            return jnp.where(overflow[..., None], exact, o)

        return jax.lax.cond(jnp.any(overflow), fix, lambda o: o, out)
    out = grid_sample_bilinear_nhwc(feat, grid)
    if not apply_fixup:
        # gather path is exact; no spread statistic
        return out, jnp.asarray([0, -1], jnp.int32)
    return out


def floor_disp_fields(gy, gx, h, w):
    """(|dy|, |dx|, relevant) integer-displacement fields of a normalized
    grid — THE shared definition of which taps the static-shift kernels
    must cover: floor source coords vs the output pixel, counting only
    taps that touch the image (out-of-image taps contribute zero under
    grid_sample zeros padding).  Users: flow_needed_disp (ratchet probe),
    _overflow_mask (fixup mask), and — re-derived in-kernel with the same
    formulas — shift_warp_v2's overflow flag (shift_warp_v2._kernel)."""
    fy = ((gy.astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    fx = ((gx.astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    relevant = ((y0 + 1 >= 0) & (y0 < h)) & ((x0 + 1 >= 0) & (x0 < w))
    return jnp.abs(y0 - rows), jnp.abs(x0 - cols), relevant


def flow_needed_disp(grid, h, w):
    """Max per-axis integer displacement this flow field needs from the
    static-shift kernels (the adaptive-D probe)."""
    dy, dx, relevant = floor_disp_fields(grid[..., 1], grid[..., 0], h, w)
    dy = jnp.where(relevant, dy, 0.0)
    dx = jnp.where(relevant, dx, 0.0)
    return jnp.maximum(jnp.max(dy), jnp.max(dx)).astype(jnp.int32)
