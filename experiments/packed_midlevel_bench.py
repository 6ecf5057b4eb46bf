#!/usr/bin/env python
"""Isolated measurement: frame-PACKED 256² mid level vs the per-frame
production chain (PERF.md "Round-3+ ideas", measure-before-building).

Question: at the 256²/C=64 level (groups=2 frame-lane packing), does
running the second conv + flow conv + mask-merge + ToRGB on the warp
kernel's native packed layout — block-diagonal kron(I_2, W) kernels with
per-lane-group modulation — beat the per-frame chain?  Unlike the
rejected WFOLD_MID there is no relayout around the warp (its packed
output is consumed directly), but an entry PACK of the up-conv output
(~ the measured 2.84 ms unpack, experiments/unpack_bench.py) moves in
where the warp's own unpack moves out; the net is the occupancy win
(C=64 → 128 lanes halves every elementwise/conv IO pass) minus the mask
lane-splat.

Reference behavior being preserved: styledecoder.py:368-425 (ToFlow),
:447-534 (synthesis chain) — math identical, layout different.

Usage:
  python experiments/packed_midlevel_bench.py --verify   # CPU exactness
  python experiments/packed_midlevel_bench.py            # time on chip
"""
import argparse
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


# ---------------------------------------------------------------------------
# g-major pack helpers (lane-group g of packed row bg holds frame g*nbg+bg)
# ---------------------------------------------------------------------------

def pack_gmajor(x, groups):
    import jax.numpy as jnp
    b, h, w, c = x.shape
    nbg = b // groups
    return jnp.transpose(x.reshape(groups, nbg, h, w, c),
                         (1, 2, 3, 0, 4)).reshape(nbg, h, w, groups * c)


def unpack_gmajor(p, groups, c):
    import jax.numpy as jnp
    return jnp.concatenate([p[..., g * c:g * c + c] for g in range(groups)],
                           axis=0)


def pack_vec_gmajor(s, groups):
    """(B, C) per-frame vector -> (B/g, g*C) packed row vector."""
    import jax.numpy as jnp
    b, c = s.shape
    nbg = b // groups
    return jnp.transpose(s.reshape(groups, nbg, c),
                         (1, 0, 2)).reshape(nbg, groups * c)


# ---------------------------------------------------------------------------
# packed (block-diagonal) modulated conv pieces
# ---------------------------------------------------------------------------

def modconv_packed(xp, style, weight, mod_weight, mod_bias, groups,
                   demodulate=True):
    """Frame-lane-packed modulated conv: input (B/g, H, W, g*I) g-major,
    kernel kron(I_g, W) (g*O, g*I, kh, kw), per-lane-group in/out scaling.
    Math identical to ops.nhwc.modulated_conv2d_cl per frame."""
    import jax
    import jax.numpy as jnp
    from float_tpu.ops.equalized import equal_linear

    _, out_c, in_c, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_c * kh * kw)
    s = equal_linear(style, mod_weight, mod_bias)            # (B, I)
    w0 = weight[0]                                           # (O, I, kh, kw)

    sp = pack_vec_gmajor(s * scale, groups)                  # (B/g, g*I)
    xm = xp * sp.astype(xp.dtype)[:, None, None, :]
    eye = jnp.eye(groups, dtype=xp.dtype)[:, :, None, None]
    wblk = jnp.kron(eye, w0.astype(xp.dtype))                # (gO, gI, kh, kw)
    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        xm, wblk, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32).astype(xp.dtype)
    if demodulate:
        w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
        sig2 = jnp.einsum("oi,bi->bo", w2, s.astype(jnp.float32) ** 2)
        demod = jax.lax.rsqrt(sig2 + 1e-8)                   # (B, O)
        out = out * pack_vec_gmajor(demod, groups).astype(
            out.dtype)[:, None, None, :]
    return out


def lrelu_packed(xp, bias, groups):
    from float_tpu.ops.nhwc import fused_leaky_relu_cl
    import jax.numpy as jnp
    return fused_leaky_relu_cl(xp, jnp.tile(bias.reshape(-1), groups))


def mask_splat_gmajor(mask, groups, cg):
    """(B, H, W, 1) per-frame mask -> (B/g, H, W, g*cg) packed lanes."""
    import jax.numpy as jnp
    b, h, w, _ = mask.shape
    nbg = b // groups
    mp = jnp.transpose(mask.reshape(groups, nbg, h, w), (1, 2, 3, 0))
    return jnp.repeat(mp, cg, axis=3)                        # (nbg,h,w,g*cg)


# ---------------------------------------------------------------------------
# the two chains (shared up-conv prologue; timed regions differ after it)
# ---------------------------------------------------------------------------

def make_params(rng, style_dim=512, c_in=128, c_mid=64):
    import jax.numpy as jnp

    def t(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s,
                           dtype=jnp.float32)

    return dict(
        w_up=t(1, c_mid, c_in, 3, 3), mw_up=t(c_in, style_dim),
        mb_up=jnp.ones((c_in,), jnp.float32), b_up=t(c_mid, s=0.02),
        w_pl=t(1, c_mid, c_mid, 3, 3), mw_pl=t(c_mid, style_dim),
        mb_pl=jnp.ones((c_mid,), jnp.float32), b_pl=t(c_mid, s=0.02),
        w_fl=t(1, 3, c_mid, 1, 1), mw_fl=t(c_mid, style_dim),
        mb_fl=jnp.ones((c_mid,), jnp.float32), b_fl=t(3, s=0.02),
        w_rgb=t(3, c_mid, 1, 1),
    )


def chain_perframe(x128, style, feat, p, *, use_kernel=True):
    """Production mid level: per-frame convs, v2 warp (g-major unpack
    inside), per-frame merge + ToRGB."""
    import jax
    import jax.numpy as jnp
    from float_tpu.ops.nhwc import (modulated_conv2d_cl, fused_leaky_relu_cl,
                                    warp_cl)
    from float_tpu.models.synthesis import identity_grid

    h = modulated_conv2d_cl(x128, style, p["w_up"], p["mw_up"], p["mb_up"],
                            demodulate=True, up=True)
    h = fused_leaky_relu_cl(h, p["b_up"])
    h = modulated_conv2d_cl(h, style, p["w_pl"], p["mw_pl"], p["mb_pl"],
                            demodulate=True)
    h = fused_leaky_relu_cl(h, p["b_pl"])
    out3 = modulated_conv2d_cl(h, style, p["w_fl"], p["mw_fl"], p["mb_fl"],
                               demodulate=False)
    out3 = out3 + p["b_fl"].reshape(1, 1, 1, 3).astype(out3.dtype)
    size = h.shape[1]
    grid = identity_grid(size, dtype=jnp.float32)[None]
    flow = jnp.tanh(out3[..., 0:2].astype(jnp.float32)) + grid
    mask = jax.nn.sigmoid(out3[..., 2:3].astype(jnp.float32)).astype(h.dtype)
    warped = warp_cl(jnp.broadcast_to(feat, h.shape).astype(h.dtype),
                     flow.astype(jnp.float32), use_kernel=use_kernel,
                     max_disp=2, shared_feat=feat.astype(h.dtype)
                     if use_kernel else None,
                     apply_fixup=False)
    warped, flags = warped
    feat_warp = warped * mask
    merged = feat_warp + h * (1.0 - mask)
    c = feat.shape[-1]
    wk = p["w_rgb"][:, :, 0, 0].astype(jnp.float32) / math.sqrt(c)
    rgb = jnp.einsum("bhwc,oc->bhwo", feat_warp,
                     wk.astype(feat_warp.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return merged, rgb, flags


def chain_packed(x128, style, feat, p, *, groups=2, use_kernel=True):
    """Packed mid level: entry pack after the up-conv, block-diag convs,
    packed warp consumed in-layout, exit unpack of the merged feature."""
    import jax
    import jax.numpy as jnp
    from float_tpu.ops.nhwc import modulated_conv2d_cl, fused_leaky_relu_cl
    from float_tpu.models.synthesis import identity_grid

    h = modulated_conv2d_cl(x128, style, p["w_up"], p["mw_up"], p["mb_up"],
                            demodulate=True, up=True)
    hp = pack_gmajor(fused_leaky_relu_cl(h, p["b_up"]), groups)  # ENTRY PACK
    hp = modconv_packed(hp, style, p["w_pl"], p["mw_pl"], p["mb_pl"], groups,
                        demodulate=True)
    hp = lrelu_packed(hp, p["b_pl"], groups)
    out_p = modconv_packed(hp, style, p["w_fl"], p["mw_fl"], p["mb_fl"],
                           groups, demodulate=False)             # (nbg,..,3g)
    out3 = unpack_gmajor(out_p, groups, 3)
    out3 = out3 + p["b_fl"].reshape(1, 1, 1, 3).astype(out3.dtype)
    size = hp.shape[1]
    c = feat.shape[-1]
    cg = 128 // groups
    grid = identity_grid(size, dtype=jnp.float32)[None]
    flow = jnp.tanh(out3[..., 0:2].astype(jnp.float32)) + grid
    mask = jax.nn.sigmoid(out3[..., 2:3].astype(jnp.float32)).astype(hp.dtype)
    if use_kernel:
        from float_tpu.ops.pallas.shift_warp_v2 import (
            warp_shared_feat_v2_packed)
        warped_p, flags, g = warp_shared_feat_v2_packed(
            feat.astype(hp.dtype), flow.astype(jnp.float32), max_disp=2,
            g_major=True)
        assert g == groups, (g, groups)
    else:
        from float_tpu.ops.nhwc import grid_sample_bilinear_nhwc
        w_pf = grid_sample_bilinear_nhwc(
            jnp.broadcast_to(feat, flow.shape[:3] + (c,)).astype(hp.dtype),
            flow.astype(hp.dtype))
        if c < cg:
            w_pf = jnp.pad(w_pf, ((0, 0),) * 3 + ((0, cg - c),))
        warped_p = pack_gmajor(w_pf, groups)
        flags = jnp.asarray([0, -1], jnp.int32)
    mask_p = mask_splat_gmajor(mask, groups, cg)
    feat_warp_p = warped_p * mask_p
    # hp has c lanes per group; warped_p cg >= c (kernel pads) — align
    hp_pad = hp if cg == c else pack_gmajor(
        jnp.pad(unpack_gmajor(hp, groups, c), ((0, 0),) * 3 + ((0, cg - c),)),
        groups)
    merged_p = feat_warp_p + hp_pad * (1.0 - mask_p)
    merged = unpack_gmajor(merged_p, groups, c)                 # EXIT UNPACK
    wk = p["w_rgb"][:, :, 0, 0].astype(jnp.float32) / math.sqrt(c)
    wkp = wk if cg == c else jnp.pad(wk, ((0, 0), (0, cg - c)))
    wblk = jnp.kron(jnp.eye(groups, dtype=jnp.float32), wkp)    # (3g, g*cg)
    rgb_p = jnp.einsum("bhwk,ok->bhwo", feat_warp_p,
                       wblk.astype(feat_warp_p.dtype),
                       preferred_element_type=jnp.float32).astype(hp.dtype)
    rgb = jnp.concatenate([rgb_p[..., 3 * g:3 * g + 3]
                           for g in range(groups)], axis=0)
    return merged, rgb, flags


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true",
                    help="CPU exactness (exact gather both paths, f32)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    if args.verify:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, size = args.frames, args.size
    c_in, c_mid, style_dim = 128, 64, 512
    dt = jnp.float32 if args.verify else jnp.bfloat16
    p = make_params(rng, style_dim, c_in, c_mid)
    x128 = jnp.asarray(rng.standard_normal(
        (b, size // 2, size // 2, c_in)).astype(np.float32) * 0.3, dt)
    style = jnp.asarray(rng.standard_normal(
        (b, style_dim)).astype(np.float32) * 0.2, jnp.float32)
    feat = jnp.asarray(rng.standard_normal(
        (1, size, size, c_mid)).astype(np.float32) * 0.3, dt)

    if args.verify:
        m_a, r_a, _ = chain_perframe(x128, style, feat, p, use_kernel=False)
        m_b, r_b, _ = chain_packed(x128, style, feat, p, use_kernel=False)
        dm = float(jnp.max(jnp.abs(m_a - m_b)))
        dr = float(jnp.max(jnp.abs(r_a - r_b)))
        print(f"verify f32 exact-gather: merged max|d|={dm:.2e} "
              f"rgb max|d|={dr:.2e}")
        assert dm < 1e-4 and dr < 1e-4, "packed math diverges"
        print("OK — packed block-diag math matches per-frame")
        return

    fa = jax.jit(lambda x, s, f: chain_perframe(x, s, f, p))
    fb = jax.jit(lambda x, s, f: chain_packed(x, s, f, p))

    def timeit(fn, tag):
        m, r, fl = fn(x128, style, feat)
        _ = float(jnp.sum(m)) + float(jnp.sum(r))      # sync (CLAUDE.md)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            m, r, fl = fn(x128, style, feat)
            _ = float(jnp.sum(m)) + float(jnp.sum(r))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{tag}: median {med:.2f} ms  (min {ts[0]:.2f}, "
              f"p90 {ts[int(len(ts)*0.9)]:.2f})")
        return med

    a = timeit(fa, f"per-frame  {b}f {size}² C={c_mid}")
    bt = timeit(fb, f"packed     {b}f {size}² C={c_mid}")
    print(f"packed/per-frame = {bt / a:.3f}  "
          f"({'WIN' if bt < a else 'LOSS'} {abs(a - bt):.2f} ms/chunk)")


if __name__ == "__main__":
    main()
