#!/usr/bin/env python
"""On-chip verification of the Pallas warp kernels (run on the real TPU).

The CPU test suite cannot execute Mosaic kernels, so this script is the
kernel layer's exactness + performance gate.  It checks, on real hardware:

1. exactness of warp_shared_feat_v2 vs the XLA patch-gather oracle across
   flow amplitudes that exercise the fast4 / fast6 / slow / fixup paths
   (errors must stay at the bf16 floor, < 6.3e-2),
2. overflow-flag completeness: at a deliberately small D, the kernel's
   per-chunk flags must catch every chunk the host-side probe marks
   (the optimistic decode's correctness hinges on no silent misses),
3. per-level kernel timings (regression reference in PERF.md).

Usage:  python tools/verify_kernels_on_chip.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np   # noqa: E402


def smooth_grid(key, b, h, w, amp_px):
    import jax
    import jax.numpy as jnp
    small = jax.random.normal(key, (b, h // 32, w // 32, 2))
    small = small / jnp.max(jnp.abs(small)) * amp_px
    flow = jax.image.resize(small, (b, h, w, 2), "bilinear")
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ident = jnp.stack([gx, gy], -1)[None]
    return (ident + flow * jnp.asarray([2.0 / w, 2.0 / h])).astype(jnp.float32)


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="one amplitude + D per level")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from float_tpu.ops.pallas.shift_warp_v2 import warp_shared_feat_v2
    from float_tpu.ops.nhwc import grid_sample_bilinear_nhwc, flow_needed_disp

    dev = jax.devices()[0]
    print(f"device: {dev}")
    b = 16
    key = jax.random.key(1)
    failures = 0

    # 1. exactness sweep
    amps = (1.3,) if args.quick else (0.4, 1.3, 2.6, 5.0)
    disps = (2,) if args.quick else (2, 3)
    for (h, c) in [(512, 32), (256, 64), (128, 128)]:
        feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        for amp in amps:
            grid = smooth_grid(jax.random.fold_in(key, int(amp * 10) + h),
                               b, h, h, amp)
            ref = grid_sample_bilinear_nhwc(
                jnp.broadcast_to(feat, (b,) + feat.shape[1:]), grid)
            for d in disps:
                out = warp_shared_feat_v2(feat, grid, max_disp=d)
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                ok = err < 6.3e-2          # bf16 floor vs the mixed oracle
                failures += not ok
                print(f"{'OK ' if ok else 'FAIL'} exact {h}²×{c} "
                      f"amp={amp} D={d}: max|err|={err:.2e}")

    # 2. flag completeness (optimistic-mode contract)
    h, c, d = 256, 64, 2
    feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
    for amp in (1.5, 3.0):
        grid = smooth_grid(jax.random.fold_in(key, 77 + int(amp)), b, h, h, amp)
        out, flag = warp_shared_feat_v2(feat, grid, max_disp=d,
                                        apply_fixup=False)
        need = int(flow_needed_disp(grid, h, h))
        flagged = int(flag[0]) > 0
        ok = flagged == (need > d)
        failures += not ok
        print(f"{'OK ' if ok else 'FAIL'} flag amp={amp}: needed={need} "
              f"D={d} flag={flagged}")

    # 2b. trace-time fast paths: exact whenever the reported spread fits
    # the path's capacity, and the spread stat itself must be honest
    # (the decode path ratchet's correctness contract)
    for (h, c) in [(512, 32), (256, 64)]:
        feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        for amp, d in ((0.6, 2), (1.3, 2), (2.6, 3)):
            grid = smooth_grid(jax.random.fold_in(key, 900 + h + int(amp * 10)),
                               b, h, h, amp)
            ref = grid_sample_bilinear_nhwc(
                jnp.broadcast_to(feat, (b,) + feat.shape[1:]), grid)
            _, flags_auto = warp_shared_feat_v2(feat, grid, max_disp=d,
                                                apply_fixup=False)
            spread = int(flags_auto[1])
            for path, cap in (("fast3", 1), ("fast4", 2), ("fast5", 3),
                              ("fast6", 4)):
                out, flags = warp_shared_feat_v2(feat, grid, max_disp=d,
                                                 apply_fixup=False, path=path)
                if spread <= cap and int(flags_auto[0]) == 0:
                    err = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                    ok = err < 6.3e-2
                    failures += not ok
                    print(f"{'OK ' if ok else 'FAIL'} path {path} {h}² "
                          f"amp={amp} D={d} spread={spread}: "
                          f"max|err|={err:.2e}")
                else:
                    # miss case: the path's own spread stat must flag it
                    ok = int(flags[1]) == spread
                    failures += not ok
                    print(f"{'OK ' if ok else 'FAIL'} path {path} {h}² "
                          f"amp={amp} D={d}: miss reported "
                          f"spread={int(flags[1])} (auto saw {spread})")

    # 2c. in-kernel ToRGB contraction (warp_shared_feat_v2_packed_rgb):
    # the packed warp's 128 lanes contract against kron(I_groups, W_rgb)
    # in the kernel epilogue — must equal gather-warp + per-frame 1x1
    from float_tpu.ops.pallas.shift_warp_v2 import (
        warp_shared_feat_v2_packed_rgb)
    for (h, c), path in [((512, 32), "auto"), ((512, 32), "fast4"),
                         ((256, 64), "auto")]:
        feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        wk = jax.random.normal(jax.random.fold_in(key, 5), (3, c),
                               jnp.float32) * 0.2
        grid = smooth_grid(jax.random.fold_in(key, 31 + h), b, h, h, 0.9)
        rgb_p, flags, groups = warp_shared_feat_v2_packed_rgb(
            feat, grid, wk, max_disp=2, path=path)
        rgb = rgb_p.reshape(b // groups, h, h, groups, 4)[..., :3]
        rgb = jnp.transpose(rgb, (0, 3, 1, 2, 4)).reshape(b, h, h, 3)
        warped = grid_sample_bilinear_nhwc(
            jnp.broadcast_to(feat, (b,) + feat.shape[1:]), grid)
        ref = jnp.einsum("bhwc,oc->bhwo", warped.astype(jnp.float32),
                         wk)
        err = float(jnp.max(jnp.abs(rgb.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        ok = err < 6.3e-2 * max(1.0, scale)
        failures += not ok
        print(f"{'OK ' if ok else 'FAIL'} rgb-fused {h}²×{c} path={path} "
              f"groups={groups}: max|err|={err:.2e} (|ref|max {scale:.2f})")

    # 2d. synthesis-level composition on real hardware: the production
    # optimistic decode (packed ToRGB + FOLDED last level + g-major
    # unpack at the mid levels) vs the always-fixup reference program —
    # guards the last-level plumbing (skip-chain adds, folded bias
    # tiling, mask commute) that the bare-kernel sections can't see.
    import math as _math
    from float_tpu.config import CHANNELS_MAP
    from float_tpu.models import init as minit
    from float_tpu.models import synthesis as S
    from float_tpu.runtime.decode import (decode_latents, _decode_chunk,
                                          _cast_params)

    sz, dim_w, dim_m, t = 512, 512, 20, 16
    dec = minit.init_synthesis(sz, dim_w, dim_m, seed=3)
    res_list = [2 ** k for k in range(3, int(_math.log2(sz)) + 1)]
    feats = [jax.random.normal(jax.random.fold_in(key, 1000 + r),
                               (1, CHANNELS_MAP[r], r, r),
                               jnp.float32) * 0.5 for r in res_list]
    s_r = jax.random.normal(jax.random.fold_in(key, 41), (1, dim_w)) * 0.3
    r_d = jax.random.normal(jax.random.fold_in(key, 42), (t, dim_w)) * 0.3
    assert S.FOLDED_LAST, "production FOLDED_LAST flag is off"
    prod = decode_latents(dec, s_r, feats, r_d, size=sz, decode_batch=8,
                          compute_dtype=jnp.bfloat16)
    dt = jnp.bfloat16
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dt)
    feats_c = [jnp.transpose(f.astype(dt), (0, 2, 3, 1)) for f in feats]
    dec_c = _cast_params(dec, dt)
    refs = []
    for c0 in range(0, t, 8):
        refs.append(_decode_chunk(dec_c, wa[c0:c0 + 8], feats_c, sz,
                                  fixup=True))
    ref = jnp.concatenate(refs, axis=0)
    err = float(jnp.max(jnp.abs(prod.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    ok = err < 3.2e-2            # inter-program bf16 floor on [0,1] frames
    failures += not ok
    print(f"{'OK ' if ok else 'FAIL'} synthesis-e2e {sz}² packed+folded "
          f"vs fixup program: max|err|={err:.2e}")

    # 3. timings (auto cond chain vs the trace-time cond-free paths)
    for (h, c) in [(512, 32), (256, 64), (128, 128)]:
        feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        grid = smooth_grid(jax.random.fold_in(key, h), b, h, h, 1.2)
        row = f"time {h}²×{c} D=2:"
        for label, kw in (("auto", dict()),
                          ("fast3", dict(apply_fixup=False, path="fast3")),
                          ("fast4", dict(apply_fixup=False, path="fast4")),
                          ("fast5", dict(apply_fixup=False, path="fast5")),
                          ("fast6", dict(apply_fixup=False, path="fast6"))):
            f = jax.jit(lambda ft, g, kw=kw: warp_shared_feat_v2(
                ft, g, max_disp=2, **kw))
            out = f(feat, grid)
            sync(out[0] if isinstance(out, tuple) else out)
            t0 = time.perf_counter()
            for _ in range(20):
                y = f(feat, grid)
            sync(y[0] if isinstance(y, tuple) else y)
            row += f"  {label} {(time.perf_counter()-t0)/20*1e3:.2f} ms"
        print(row + "  (16 frames)")

    print(f"\n{'PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
