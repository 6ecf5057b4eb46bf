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
import numpy as np

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
    # phase-major stacking: out lane (a·2+p)·O + o.  The scatter of
    # comp's taps into the per-phase kernel is a FIXED linear map of
    # comp, so it runs as ONE einsum against a constant 0/1 tensor —
    # never as a chain of dynamic-update-slices (w0 is a runtime
    # parameter, so XLA cannot constant-fold a .at[].set() build; the
    # DUS chain measured ~15 ms/chunk serial on chip, PERF.md r5
    # fusion-lane decomposition).
    oy_all, ox_all = [], []
    for a in (0, 1):
        for bp in (0, 1):
            ty = [t for t in range(kk) if (a + t - pad0) % 2 == 0]
            tx = [t for t in range(kk) if (bp + t - pad0) % 2 == 0]
            oy_all.append([(a + t - pad0) // 2 for t in ty])
            ox_all.append([(bp + t - pad0) // 2 for t in tx])
    lo_y = min(o[0] for o in oy_all)
    hi_y = max(o[-1] for o in oy_all)
    lo_x = min(o[0] for o in ox_all)
    hi_x = max(o[-1] for o in ox_all)
    ny, nx = hi_y - lo_y + 1, hi_x - lo_x + 1
    sc = np.zeros((4, kk, kk, ny, nx), np.float32)
    for ph in range(4):
        a, bp = divmod(ph, 2)
        for t in range(kk):
            if (a + t - pad0) % 2:
                continue
            y = (a + t - pad0) // 2 - lo_y
            for u in range(kk):
                if (bp + u - pad0) % 2:
                    continue
                sc[ph, t, u, y, (bp + u - pad0) // 2 - lo_x] = 1.0
    big = jnp.einsum("oitu,ptuyx->poiyx", comp, jnp.asarray(sc),
                     preferred_element_type=jnp.float32)
    bigk = big.reshape(4 * out_c, in_c, ny, nx)
    out = jax.lax.conv_general_dilated(
        xm, bigk.astype(x.dtype), (1, 1),
        ((-lo_y, hi_y), (-lo_x, hi_x)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out * jnp.tile(demod, (1, 4)).astype(x.dtype)[:, None, None, :]


def _folded_scatter_const():
    """Constant 0/1 tensor T[p, u, v, q, t, s]: the fixed linear map
    taking w0[o, i, u, v] to the folded kernel position
    [p, o, q, i, t, s] (p = out phase a·2+bp, q = in phase, (t, s) the
    folded tap).  Injective per p — the einsum sum never overlaps."""
    T = np.zeros((4, 3, 3, 4, 3, 3), np.float32)
    for a in (0, 1):
        for u in range(3):
            t, q = divmod(a + u - 1, 2)
            for bp in (0, 1):
                for v in range(3):
                    s_, r = divmod(bp + v - 1, 2)
                    T[a * 2 + bp, u, v, q * 2 + r, t + 1, s_ + 1] = 1.0
    return T


_FOLDED_SCATTER = _folded_scatter_const()


def _folded_plain_kernel(w0):
    """(O, I, 3, 3) -> the folded (4·O, 4·I, 3, 3) kernel of the same
    stride-1 image-space conv acting on 2×2-folded tensors.

    ONE einsum against a constant scatter tensor — the equivalent
    .at[].set() build is 36 chained dynamic-update-slice fusions at
    runtime (w0 is a parameter, not foldable), measured ~15 ms/chunk
    serial on chip (PERF.md r5 fusion-lane decomposition)."""
    out_c, in_c, kh, kw = w0.shape
    assert kh == 3 and kw == 3, "folded form derived for 3x3"
    k = jnp.einsum("oiuv,puvqts->poqits", w0.astype(jnp.float32),
                   jnp.asarray(_FOLDED_SCATTER),
                   preferred_element_type=jnp.float32).astype(w0.dtype)
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
        ox_all = []
        for bp in (0, 1):                  # output col parity -> channels
            tx = [t for t in range(kk) if (bp + t - pad0) % 2 == 0]
            ox_all.append([(bp + t - pad0) // 2 for t in tx])
        lo_x = min(o[0] for o in ox_all)
        hi_x = max(o[-1] for o in ox_all)
        nx = hi_x - lo_x + 1
        # constant scatter einsum, not a runtime DUS build (see
        # _folded_scatter_const rationale)
        sc = np.zeros((2, kk, nx), np.float32)
        for bp in range(2):
            for u in range(kk):
                if (bp + u - pad0) % 2 == 0:
                    sc[bp, u, (bp + u - pad0) // 2 - lo_x] = 1.0
        big = jnp.einsum("oiju,pux->poijx", comp[:, :, ty],
                         jnp.asarray(sc),
                         preferred_element_type=jnp.float32)
        bigk = big.reshape(2 * out_c, in_c, len(ty), nx)
        o = jax.lax.conv_general_dilated(
            xm, bigk.astype(x.dtype), (1, 1),
            ((-min(oy), max(oy)), (-lo_x, hi_x)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        outs.append(o)
    y = jnp.stack(outs, axis=2).reshape(b, 2 * h, w, 2 * out_c)
    return y * jnp.tile(demod, (1, 2)).astype(x.dtype)[:, None, None, :]


def _wfolded_scatter_const():
    """Constant 0/1 tensor T[p, v, q, s] for the W-folded kernel build
    (same DUS-avoidance rationale as _folded_scatter_const)."""
    T = np.zeros((2, 3, 2, 3), np.float32)
    for px in (0, 1):
        for v in range(3):
            s_, q = divmod(px + v - 1, 2)
            T[px, v, q, s_ + 1] = 1.0
    return T


_WFOLDED_SCATTER = _wfolded_scatter_const()


def _wfolded_plain_kernel(w0):
    """(O, I, 3, 3) -> the W-folded (2O, 2I, 3, 3) kernel of the same
    stride-1 image-space conv acting on 2×1-W-folded tensors.  One
    einsum against a constant scatter — not a runtime DUS chain."""
    out_c, in_c, kh, kw = w0.shape
    assert kh == 3 and kw == 3, "W-folded form derived for 3x3"
    k = jnp.einsum("oiuv,pvqs->poqius", w0.astype(jnp.float32),
                   jnp.asarray(_WFOLDED_SCATTER),
                   preferred_element_type=jnp.float32).astype(w0.dtype)
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
