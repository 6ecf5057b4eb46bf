"""Isolated per-level timings of the v2 packed warp kernel on realistic
smooth flows, with variants to locate the gap to the VPU roofline:

  base      current kernel (per-(tile,group) fast-path cond)
  gather    XLA patch-gather baseline
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from float_tpu.ops.pallas.shift_warp_v2 import warp_shared_feat_v2
from float_tpu.ops.nhwc import grid_sample_bilinear_nhwc

B = 16


from tools.verify_kernels_on_chip import smooth_grid as _sg, sync


def smooth_grid(key, h, w, amp_px):
    return _sg(key, B, h, w, amp_px)


def bench(fn, *args, n=30):
    y = fn(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    key = jax.random.key(0)
    for (h, c) in [(512, 32), (256, 64), (128, 128)]:
        feat = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        grid = smooth_grid(jax.random.fold_in(key, h), h, h, amp)
        for d in (1, 2, 3):
            f = jax.jit(lambda ft, g, d=d: warp_shared_feat_v2(ft, g, max_disp=d))
            t = bench(f, feat, grid)
            print(f"{h}²×{c} D={d}: {t:.2f} ms")
        g = jax.jit(lambda ft, gr: grid_sample_bilinear_nhwc(
            jnp.broadcast_to(ft, (B,) + ft.shape[1:]), gr))
        print(f"{h}²×{c} gather: {bench(g, feat, grid):.2f} ms")


if __name__ == "__main__":
    main()
