"""Space-to-depth FOLDED forms of the 512² synthesis level's convs.

The chunk HLO lays the (B, 512, 512, 32) activations out with C in the
128-lane dim at 25% occupancy (PERF.md "layout-bound"), so every conv IO
and elementwise pass at the hot last level runs quarter-width.  At the
LAST level the merged feature is dead (the only consumers of the style
branch are the 3-channel flow conv; the warped feature goes straight to
the packed ToRGB) — so the whole level can run in a 2×2 space-to-depth
FOLDED layout

    X512[b, 2m+a, 2n+p, c]  ==  F[b, m, n, (a*2+p)*C + c]

i.e. (B, 256, 256, 128) at FULL lane occupancy, and the quarter-width
512²×32 tensor never materializes.  Only the tiny 3-channel flow
prediction is ever unfolded.

Folded-kernel math (each verified exact vs the NHWC ops in
tests/test_folded.py):

- up-modulated-conv + blur: the composed (conv_transposeₛ₂ ∘ blur) 6×6
  kernel phase-decomposes into 4 per-phase 3×3 kernels over the 256²
  input (no dilation zeros); stacked phase-major they are ONE
  (4·O, I, 3, 3) conv whose output IS the folded layout
  (experiments/upconv_phase_bench.py measured the stacked form tying the
  dilated form isolated — the folded win is skipping the depth-to-space
  + every downstream quarter-width pass).
- plain 3×3 modulated conv: output-phase a, tap u address input image
  row 2m+a+u-1 = 2(m+t)+q with (t, q) = divmod(a+u-1, 2) — a 3×3 folded
  conv (128→128) whose kernel scatters w[o,i,u,v] to
  [(a·2+p)·O+o, (q·2+r)·I+i, t+1, s+1]; a zero-pad of one folded pixel
  reproduces the image-space zero pad exactly (taps reach at most 1
  image pixel beyond the border).
- 1×1 modulated conv (ToFlow's sampler head): block-diagonal
  kron(I₄, W) on the folded lanes.

Modulation scales fold trivially: the input scaling s (B, I) and demod
(B, O) tile phase-major ([s s s s] — lane ph·C+c reads element c).

Reference behavior preserved: styledecoder.py:447-534 (synthesis chain),
:368-425 (ToFlow); identical math to ops/nhwc.py, folded layout only.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .activations import leaky_relu, LRELU_SCALE
from .equalized import equal_linear
from .upfirdn import make_blur_kernel
from .modulated import _EPS


def unfold2x2(f, out_c: int):
    """(B, H, W, 4·C) folded (phase-major lanes) -> (B, 2H, 2W, C)."""
    b, h, w, _ = f.shape
    y = f.reshape(b, h, w, 2, 2, out_c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, 2 * h, 2 * w, out_c)


def fold2x2(x):
    """(B, 2H, 2W, C) -> (B, H, W, 4·C) folded (phase-major lanes)."""
    b, h2, w2, c = x.shape
    y = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h2 // 2, w2 // 2, 4 * c)


def _composed_up_kernel(w0, blur_kernel):
    """(O, I, kh, kw) torch-layout weight -> the composed
    (conv_transpose stride-2 ∘ blur) kernel (O, I, kh+bk-1, kw+bk-1) and
    its dilated-space pad origin (ops/nhwc.py FUSE_UP_BLUR composition)."""
    out_c, in_c, kh, kw = w0.shape
    wt = jnp.flip(w0, (2, 3))
    factor = 2
    k2 = make_blur_kernel(blur_kernel, upsample_factor=factor)
    bk = k2.shape[0]
    wt_f = wt.reshape(out_c * in_c, 1, kh, kw).astype(jnp.float32)
    comp = jax.lax.conv_general_dilated(
        wt_f, k2.astype(jnp.float32)[None, None], (1, 1),
        ((bk - 1, bk - 1), (bk - 1, bk - 1)),
        preferred_element_type=jnp.float32)
    comp = comp.reshape(out_c, in_c, kh + bk - 1, kw + bk - 1)
    p = (len(blur_kernel) - factor) - (kh - 1)
    pad0 = (p + 1) // 2 + factor - 1 + (kh - 1)
    return comp, pad0


def up_modconv_folded(x, style, weight, mod_weight, mod_bias,
                      blur_kernel=(1, 3, 3, 1)):
    """Modulated up-conv (incl. post-upsample blur), output FOLDED.

    x (B, H, W, I) -> (B, H, W, 4·O) representing the (B, 2H, 2W, O)
    result of modulated_conv2d_cl(..., up=True).  One stacked-phase conv,
    no dilation zeros, no depth-to-space.
    """
    b, h, w, in_c = x.shape
    _, out_c, _, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)
    w0 = weight[0]
    w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
    sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
    demod = jax.lax.rsqrt(sig2 + _EPS)
    xm = x * (s * scale).astype(x.dtype)[:, None, None, :]

    comp, pad0 = _composed_up_kernel(w0, blur_kernel)
    kk = comp.shape[2]
    # phase-major stacking: out lane (a·2+p)·O + o
    oy_all, ox_all, subs = [], [], []
    for a in (0, 1):
        for bp in (0, 1):
            ty = [t for t in range(kk) if (a + t - pad0) % 2 == 0]
            tx = [t for t in range(kk) if (bp + t - pad0) % 2 == 0]
            oy_all.append([(a + t - pad0) // 2 for t in ty])
            ox_all.append([(bp + t - pad0) // 2 for t in tx])
            subs.append(comp[:, :, ty][:, :, :, tx])
    lo_y = min(o[0] for o in oy_all)
    hi_y = max(o[-1] for o in oy_all)
    lo_x = min(o[0] for o in ox_all)
    hi_x = max(o[-1] for o in ox_all)
    big = jnp.zeros((4, out_c, in_c, hi_y - lo_y + 1, hi_x - lo_x + 1),
                    jnp.float32)
    for ph in range(4):
        oy, ox = oy_all[ph], ox_all[ph]
        big = big.at[ph, :, :, oy[0] - lo_y:oy[0] - lo_y + len(oy),
                     ox[0] - lo_x:ox[0] - lo_x + len(ox)].set(subs[ph])
    bigk = big.reshape(4 * out_c, in_c, big.shape[3], big.shape[4])
    out = jax.lax.conv_general_dilated(
        xm, bigk.astype(x.dtype), (1, 1),
        ((-lo_y, hi_y), (-lo_x, hi_x)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out * jnp.tile(demod, (1, 4)).astype(x.dtype)[:, None, None, :]


def _folded_plain_kernel(w0):
    """(O, I, 3, 3) -> the folded (4·O, 4·I, 3, 3) kernel of the same
    stride-1 image-space conv acting on 2×2-folded tensors."""
    out_c, in_c, kh, kw = w0.shape
    assert kh == 3 and kw == 3, "folded form derived for 3x3"
    k = jnp.zeros((4, out_c, 4, in_c, 3, 3), w0.dtype)
    for a in (0, 1):
        for u in range(3):
            t, q = divmod(a + u - 1, 2)
            for bp in (0, 1):
                for v in range(3):
                    s_, r = divmod(bp + v - 1, 2)
                    k = k.at[a * 2 + bp, :, q * 2 + r, :,
                             t + 1, s_ + 1].set(w0[:, :, u, v])
    return k.reshape(4 * out_c, 4 * in_c, 3, 3)


def modconv_folded(f, style, weight, mod_weight, mod_bias,
                   demodulate=True):
    """Modulated 3×3 stride-1 conv on a FOLDED tensor (folded in/out).

    f (B, H, W, 4·I) folded -> (B, H, W, 4·O) folded; exact equivalent of
    modulated_conv2d_cl(unfold(f), ...) folded back.  4× the raw MACs
    (structural zeros in the folded kernel) but full 128-lane IO — the
    level is IO-bound, not MXU-bound (PERF.md).
    """
    b = f.shape[0]
    _, out_c, in_c, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)            # (B, I)
    w0 = weight[0]
    if demodulate:
        w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
        sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
        demod = jax.lax.rsqrt(sig2 + _EPS)
    fm = f * jnp.tile(s * scale, (1, 4)).astype(f.dtype)[:, None, None, :]
    kf = _folded_plain_kernel(w0.astype(f.dtype))
    out = jax.lax.conv_general_dilated(
        fm, kf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(f.dtype)
    if demodulate:
        out = out * jnp.tile(demod, (1, 4)).astype(f.dtype)[:, None, None, :]
    return out


def modconv1x1_folded(f, style, weight, mod_weight, mod_bias):
    """Modulated 1×1 conv (demod=False — ToFlow's sampler head) on a
    FOLDED tensor: block-diagonal kron(I₄, W) over the lanes."""
    _, out_c, in_c, kh, kw = weight.shape
    assert kh == 1 and kw == 1
    scale = 1.0 / math.sqrt(in_c)
    s = equal_linear(style, mod_weight, mod_bias)
    fm = f * jnp.tile(s * scale, (1, 4)).astype(f.dtype)[:, None, None, :]
    wk = weight[0, :, :, 0, 0].astype(jnp.float32)           # (O, I)
    wblk = jnp.kron(jnp.eye(4, dtype=jnp.float32), wk)       # (4O, 4I)
    return jnp.einsum("bhwk,ok->bhwo", fm, wblk.astype(f.dtype),
                      preferred_element_type=jnp.float32).astype(f.dtype)


def lrelu_folded(f, bias, negative_slope=0.2, scale=LRELU_SCALE,
                 phases: int = 4):
    """fused_leaky_relu_cl with the per-channel bias tiled phase-major."""
    if bias is not None:
        f = f + jnp.tile(bias.reshape(-1), phases).astype(f.dtype)
    return leaky_relu(f, negative_slope) * scale


# ---------------------------------------------------------------------------
# W-fold (2x1): the MIDDLE levels' form
# ---------------------------------------------------------------------------
#
# In NHWC, (B, H, W, C) -> (B, H, W/2, 2C) with lane px·C + c is an
# INDEX-IDENTITY reshape (x·C + c == x2·2C + (px·C + c) for x = 2·x2+px):
# jnp.reshape both ways, no transpose.  Physically XLA re-lays the
# padded-lane tensor into a packed one (a cheap copy), after which every
# conv IO and elementwise pass at a C = 64 level runs full-width instead
# of half.  Used for the second-to-last (256²) level, whose merged output
# must stay per-frame (it feeds the next up-conv) so the 2×2 fold above
# does not apply.


def wfold(x):
    """(B, H, W, C) -> (B, H, W/2, 2C) W-folded (pure reshape)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def wunfold(f):
    """(B, H, W2, 2C) W-folded -> (B, H, 2·W2, C) (pure reshape)."""
    b, h, w2, c2 = f.shape
    return f.reshape(b, h, 2 * w2, c2 // 2)


def up_modconv_wfolded(x, style, weight, mod_weight, mod_bias,
                       blur_kernel=(1, 3, 3, 1)):
    """Modulated up-conv (incl. blur), output W-FOLDED.

    x (B, H, W, I) -> (B, 2H, W, 2·O) representing the (B, 2H, 2W, O)
    result of modulated_conv2d_cl(..., up=True): per H-parity one
    stacked-W-phase conv over the unstrided input, interleaved along H
    (a free reshape — the W/C dims, the tiled pair, are untouched).
    """
    b, h, w, in_c = x.shape
    _, out_c, _, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)
    w0 = weight[0]
    w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
    sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
    demod = jax.lax.rsqrt(sig2 + _EPS)
    xm = x * (s * scale).astype(x.dtype)[:, None, None, :]

    comp, pad0 = _composed_up_kernel(w0, blur_kernel)
    kk = comp.shape[2]
    outs = []
    for a in (0, 1):                       # output row parity
        ty = [t for t in range(kk) if (a + t - pad0) % 2 == 0]
        oy = [(a + t - pad0) // 2 for t in ty]
        sub_bp, ox_all = [], []
        for bp in (0, 1):                  # output col parity -> channels
            tx = [t for t in range(kk) if (bp + t - pad0) % 2 == 0]
            ox_all.append([(bp + t - pad0) // 2 for t in tx])
            sub_bp.append(comp[:, :, ty][:, :, :, tx])
        lo_x = min(o[0] for o in ox_all)
        hi_x = max(o[-1] for o in ox_all)
        big = jnp.zeros((2, out_c, in_c, len(ty), hi_x - lo_x + 1),
                        jnp.float32)
        for bp in range(2):
            ox = ox_all[bp]
            big = big.at[bp, :, :, :,
                         ox[0] - lo_x:ox[0] - lo_x + len(ox)].set(sub_bp[bp])
        bigk = big.reshape(2 * out_c, in_c, len(ty), hi_x - lo_x + 1)
        o = jax.lax.conv_general_dilated(
            xm, bigk.astype(x.dtype), (1, 1),
            ((-min(oy), max(oy)), (-lo_x, hi_x)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        outs.append(o)
    y = jnp.stack(outs, axis=2).reshape(b, 2 * h, w, 2 * out_c)
    return y * jnp.tile(demod, (1, 2)).astype(x.dtype)[:, None, None, :]


def _wfolded_plain_kernel(w0):
    """(O, I, 3, 3) -> the W-folded (2O, 2I, 3, 3) kernel of the same
    stride-1 image-space conv acting on 2×1-W-folded tensors."""
    out_c, in_c, kh, kw = w0.shape
    assert kh == 3 and kw == 3, "W-folded form derived for 3x3"
    k = jnp.zeros((2, out_c, 2, in_c, 3, 3), w0.dtype)
    for px in (0, 1):
        for v in range(3):
            s_, q = divmod(px + v - 1, 2)
            k = k.at[px, :, q, :, :, s_ + 1].set(w0[:, :, :, v])
    return k.reshape(2 * out_c, 2 * in_c, 3, 3)


def modconv_wfolded(f, style, weight, mod_weight, mod_bias,
                    demodulate=True):
    """Modulated 3×3 stride-1 conv on a W-FOLDED tensor (folded in/out):
    exact equivalent of modulated_conv2d_cl(wunfold(f), ...) folded."""
    _, out_c, in_c, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)
    w0 = weight[0]
    if demodulate:
        w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
        sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
        demod = jax.lax.rsqrt(sig2 + _EPS)
    fm = f * jnp.tile(s * scale, (1, 2)).astype(f.dtype)[:, None, None, :]
    kf = _wfolded_plain_kernel(w0.astype(f.dtype))
    out = jax.lax.conv_general_dilated(
        fm, kf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(f.dtype)
    if demodulate:
        out = out * jnp.tile(demod, (1, 2)).astype(f.dtype)[:, None, None, :]
    return out


def modconv1x1_wfolded(f, style, weight, mod_weight, mod_bias):
    """Modulated 1×1 conv (demod=False) on a W-FOLDED tensor:
    kron(I₂, W) over the lanes."""
    _, out_c, in_c, kh, kw = weight.shape
    assert kh == 1 and kw == 1
    scale = 1.0 / math.sqrt(in_c)
    s = equal_linear(style, mod_weight, mod_bias)
    fm = f * jnp.tile(s * scale, (1, 2)).astype(f.dtype)[:, None, None, :]
    wk = weight[0, :, :, 0, 0].astype(jnp.float32)
    wblk = jnp.kron(jnp.eye(2, dtype=jnp.float32), wk)
    return jnp.einsum("bhwk,ok->bhwo", fm, wblk.astype(f.dtype),
                      preferred_element_type=jnp.float32).astype(f.dtype)


def equal_conv1x1_wfolded(f, weight):
    """EqualConv2d 1×1 on a W-FOLDED tensor (ToRGB's conv)."""
    o, i, kh, kw = weight.shape
    assert kh == 1 and kw == 1
    wk = weight[:, :, 0, 0].astype(jnp.float32) * (1.0 / math.sqrt(i))
    wblk = jnp.kron(jnp.eye(2, dtype=jnp.float32), wk)
    return jnp.einsum("bhwk,ok->bhwo", f, wblk.astype(f.dtype),
                      preferred_element_type=jnp.float32).astype(f.dtype)
