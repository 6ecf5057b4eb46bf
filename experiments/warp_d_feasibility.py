#!/usr/bin/env python
"""Which warp-kernel D values actually COMPILE at each level (r4).

The D ratchet capped at MAX_WARP_DISP=7, but configs 3/5 showed D=7-8 at
512² blows the 30 MB scoped-vmem stack at compile time (the (2d+2)
pre-rotated window slices scale with d) — a production crash path.  This
probes compile+run for D=3..7 at the three kernel levels with the
production shapes (24-frame chunk) so MAX_WARP_DISP can be a PROVEN
per-level bound.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from float_tpu.ops.pallas.shift_warp_v2 import warp_shared_feat_v2

LEVELS = [(512, 32), (256, 64), (128, 128)]   # (H=W, C)
B = 24


def main():
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    for size, c in LEVELS:
        feat = jnp.asarray(rng.standard_normal((1, size, size, c))
                           .astype(np.float32)).astype(jnp.bfloat16)
        # identity-ish grid with small flow: correctness isn't probed here
        ys, xs = np.meshgrid(np.linspace(-1, 1, size),
                             np.linspace(-1, 1, size), indexing="ij")
        g = np.stack([xs, ys], -1)[None].astype(np.float32)
        grid = jnp.asarray(np.repeat(g, B, 0)
                           + rng.standard_normal((B, size, size, 2))
                           .astype(np.float32) * 0.001)
        row = []
        for d in range(3, 8):
            t0 = time.perf_counter()
            try:
                out = warp_shared_feat_v2(feat, grid, max_disp=d)
                if isinstance(out, tuple):
                    out = out[0]
                float(jnp.sum(out[..., :1].astype(jnp.float32)))
                row.append(f"D={d}: OK ({time.perf_counter()-t0:.0f}s)")
            except Exception as e:          # noqa: BLE001 — probing
                msg = str(e)
                short = ("vmem-OOM" if "vmem" in msg or "Scoped" in msg
                         else msg.splitlines()[0][:60])
                row.append(f"D={d}: FAIL {short}")
        print(f"{size}²×{c}: " + " | ".join(row))


if __name__ == "__main__":
    main()
