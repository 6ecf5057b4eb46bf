"""Up-modulated-conv formulations at the hot 256²->512² (64->32) level.

Hypothesis: XLA:TPU computes the lhs-dilated transposed conv by
materializing the dilation zeros (the 513² intermediate in the chunk
HLO), wasting ~4x MXU MACs; a subpixel PHASE decomposition (4 phase
convs on the 256² input + pixel-shuffle interleave) does the same math
with no zeros, and the post-upsample blur composes into the phase
kernels for free (each phase of the composed 6x6 kernel is 3x3).

Variants benchmarked (all exact, cross-checked):
  dilated       current modulated_conv2d_cl(up=True) incl. blur
  phase         4 phase convs of the composed (conv ∘ blur) kernel +
                interleave
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from float_tpu.ops.nhwc import modulated_conv2d_cl
from float_tpu.ops.upfirdn import make_blur_kernel
from float_tpu.ops.modulated import _EPS
from float_tpu.ops.equalized import equal_linear
import math


def phase_up_modconv(x, style, weight, mod_weight, mod_bias,
                     blur_kernel=(1, 3, 3, 1)):
    """Exact phase-space equivalent of modulated_conv2d_cl(up=True)."""
    b, h, w, in_c = x.shape
    _, out_c, _, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)            # (B, I)
    w0 = weight[0]
    w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
    sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
    demod = jax.lax.rsqrt(sig2 + _EPS)
    xm = x * (s * scale).astype(x.dtype)[:, None, None, :]

    # composed kernel: conv_transpose(w) then blur == ONE 6x6 dilated
    # kernel (the FUSE_UP_BLUR composition, ops/nhwc.py)
    wt = jnp.flip(w0, (2, 3))
    factor = 2
    k2 = make_blur_kernel(blur_kernel, upsample_factor=factor)
    bk = k2.shape[0]
    wt_f = wt.reshape(out_c * in_c, 1, kh, kw).astype(jnp.float32)
    comp = jax.lax.conv_general_dilated(
        wt_f, k2.astype(jnp.float32)[None, None], (1, 1),
        ((bk - 1, bk - 1), (bk - 1, bk - 1)),
        preferred_element_type=jnp.float32)
    comp = comp.reshape(out_c, in_c, kh + bk - 1, kw + bk - 1)  # (O,I,6,6)

    # reference padded-dilated indexing (modulated_conv2d_cl FUSE_UP_BLUR):
    # out = conv(dilate2(xm), comp, pad kh-1+pad0/1) with
    # p = (len(blur)-2) - (kh-1); pad = ((p+1)//2 + 1, p//2 + 1)
    p = (len(blur_kernel) - factor) - (kh - 1)
    pad0 = (p + 1) // 2 + factor - 1 + (kh - 1)
    # output pixel (oy, ox) = sum_{ty,tx} dil[oy+ty-? ...]; phase
    # decomposition: dil[2m+1? ...]. Derive by parity: dilated input has
    # x at even coords (2i). out[o] = sum_t comp[t]·dil[o + t - pad0]
    # → contributing taps t with (o + t - pad0) even.
    kk = comp.shape[2]
    outs = {}
    for a in (0, 1):            # output row parity
        for bph in (0, 1):      # output col parity
            # taps where (a + ty - pad0) % 2 == 0 and same for cols
            ty = [t for t in range(kk) if (a + t - pad0) % 2 == 0]
            tx = [t for t in range(kk) if (bph + t - pad0) % 2 == 0]
            sub = comp[:, :, ty][:, :, :, tx]                # (O,I,|ty|,|tx|)
            # input index i = (o + t - pad0)//2 for o=2m+a → m + (a+t-pad0)//2
            oy = [(a + t - pad0) // 2 for t in ty]
            ox = [(bph + t - pad0) // 2 for t in tx]
            # conv with pad so in index m+oy[j] maps: pad_lo = -min(oy)
            py = (-min(oy), max(oy) + 1 - 1)   # window covers min..max
            px = (-min(ox), max(ox) + 1 - 1)
            sub_flip = jnp.flip(sub, (2, 3))   # conv vs correlation
            out = jax.lax.conv_general_dilated(
                xm, sub.astype(x.dtype), (1, 1),
                ((py[0], max(oy)), (px[0], max(ox))),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            outs[(a, bph)] = out
    del sub_flip
    # interleave phases -> (B, 2H, 2W, O)
    top = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)
    bot = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    y = jnp.stack([top, bot], axis=2)          # (B,H,2,W,2,O)
    y = y.reshape(b, 2 * h, 2 * w, out_c)
    return y * demod.astype(x.dtype)[:, None, None, :]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, n=20):
    y = fn(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    for (h, in_c, out_c, b) in [(256, 64, 32, 16), (128, 128, 64, 16),
                                (64, 256, 128, 16)]:
        x = jnp.asarray(rng.standard_normal((b, h, h, in_c)).astype(np.float32)).astype(jnp.bfloat16)
        style = jnp.asarray(rng.standard_normal((b, 64)).astype(np.float32))
        weight = jnp.asarray(rng.standard_normal((1, out_c, in_c, 3, 3)).astype(np.float32) * 0.1)
        mw = jnp.asarray(rng.standard_normal((in_c, 64)).astype(np.float32) * 0.1)
        mb = jnp.asarray(np.ones(in_c, np.float32))

        f_dil = jax.jit(lambda *a: modulated_conv2d_cl(*a, demodulate=True, up=True))
        f_ph = jax.jit(phase_up_modconv)
        ref = f_dil(x, style, weight, mw, mb)
        got = f_ph(x, style, weight, mw, mb)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        scale_ref = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        t_dil = bench(f_dil, x, style, weight, mw, mb)
        t_ph = bench(f_ph, x, style, weight, mw, mb)
        print(f"{h}²x{in_c}->{out_c}: dilated {t_dil:.2f} ms, "
              f"phase {t_ph:.2f} ms, max|err|={err:.3e} (|ref|max {scale_ref:.2f})")


if __name__ == "__main__":
    main()


def phase1_up_modconv(x, style, weight, mod_weight, mod_bias,
                      blur_kernel=(1, 3, 3, 1)):
    """ONE stacked-phase conv (N = 4·out_c, full MXU width, no dilation
    zeros) + depth-to-space interleave."""
    b, h, w, in_c = x.shape
    _, out_c, _, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)
    w0 = weight[0]
    w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
    sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
    demod = jax.lax.rsqrt(sig2 + _EPS)
    xm = x * (s * scale).astype(x.dtype)[:, None, None, :]

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
    kk = comp.shape[2]
    # stack the 4 phase kernels into one (4*O, I, 3, 3) kernel; all
    # phases share tap-offset range via a common padded window
    phase_kernels = []
    oy_all, ox_all = [], []
    for a in (0, 1):
        for bph in (0, 1):
            ty = [t for t in range(kk) if (a + t - pad0) % 2 == 0]
            tx = [t for t in range(kk) if (bph + t - pad0) % 2 == 0]
            oy_all.append([(a + t - pad0) // 2 for t in ty])
            ox_all.append([(bph + t - pad0) // 2 for t in tx])
            phase_kernels.append(comp[:, :, ty][:, :, :, tx])
    lo_y = min(o[0] for o in oy_all); hi_y = max(o[-1] for o in oy_all)
    lo_x = min(o[0] for o in ox_all); hi_x = max(o[-1] for o in ox_all)
    span_y = hi_y - lo_y + 1
    span_x = hi_x - lo_x + 1
    big = jnp.zeros((4, out_c, in_c, span_y, span_x), jnp.float32)
    for ph in range(4):
        oy, ox = oy_all[ph], ox_all[ph]
        sub = phase_kernels[ph]
        big = big.at[ph, :, :, oy[0] - lo_y:oy[0] - lo_y + len(oy),
                     ox[0] - lo_x:ox[0] - lo_x + len(ox)].set(sub)
    bigk = big.reshape(4 * out_c, in_c, span_y, span_x)
    out = jax.lax.conv_general_dilated(
        xm, bigk.astype(x.dtype), (1, 1),
        ((-lo_y, hi_y), (-lo_x, hi_x)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)   # (b,h,w,4O)
    out = out * jnp.tile(demod, (1, 4)).astype(x.dtype)[:, None, None, :]
    # depth-to-space: phase ph = a*2+b, channel ph*O+o
    y = out.reshape(b, h, w, 2, 2, out_c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, out_c)
    return y


def extra():
    rng = np.random.default_rng(0)
    for (h, in_c, out_c, b) in [(256, 64, 32, 16), (128, 128, 64, 16),
                                (64, 256, 128, 16)]:
        x = jnp.asarray(rng.standard_normal((b, h, h, in_c)).astype(np.float32)).astype(jnp.bfloat16)
        style = jnp.asarray(rng.standard_normal((b, 64)).astype(np.float32))
        weight = jnp.asarray(rng.standard_normal((1, out_c, in_c, 3, 3)).astype(np.float32) * 0.1)
        mw = jnp.asarray(rng.standard_normal((in_c, 64)).astype(np.float32) * 0.1)
        mb = jnp.asarray(np.ones(in_c, np.float32))
        f_dil = jax.jit(lambda *a: modulated_conv2d_cl(*a, demodulate=True, up=True))
        f_p1 = jax.jit(phase1_up_modconv)
        ref = f_dil(x, style, weight, mw, mb)
        got = f_p1(x, style, weight, mw, mb)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        t_dil = bench(f_dil, x, style, weight, mw, mb)
        t_p1 = bench(f_p1, x, style, weight, mw, mb)
        print(f"{h}²x{in_c}->{out_c}: dilated {t_dil:.2f} ms, "
              f"phase1conv {t_p1:.2f} ms, max|err|={err:.3e}")
