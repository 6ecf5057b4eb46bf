"""Folded vs unfolded 512² last-level conv chain, isolated on chip.

Chain: up-modconv(64->32, incl. blur) -> lrelu -> plain modconv(32->32)
-> lrelu -> 1x1 flow conv (32->3).  The folded form runs everything at
(256², 128 lanes) full occupancy and unfolds only the 3-channel result.

PERF.md measurement caveat applies: isolated wins can lose in-graph —
this probe sizes the candidate before integration.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from float_tpu.ops.nhwc import modulated_conv2d_cl, fused_leaky_relu_cl
from float_tpu.ops.folded import (
    up_modconv_folded, modconv_folded, modconv1x1_folded, lrelu_folded,
    unfold2x2,
)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, n=30):
    y = fn(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    b, h, c_in, c_mid, dim_w = 16, 256, 64, 32, 512
    x = jnp.asarray(rng.standard_normal((b, h, h, c_in)).astype(np.float32)
                    * 0.3).astype(jnp.bfloat16)
    style = jnp.asarray(rng.standard_normal((b, dim_w)).astype(np.float32))
    w_up = jnp.asarray(rng.standard_normal((1, c_mid, c_in, 3, 3)).astype(np.float32) * 0.1)
    w_pl = jnp.asarray(rng.standard_normal((1, c_mid, c_mid, 3, 3)).astype(np.float32) * 0.1)
    w_fl = jnp.asarray(rng.standard_normal((1, 3, c_mid, 1, 1)).astype(np.float32) * 0.1)
    mw_up = jnp.asarray(rng.standard_normal((c_in, dim_w)).astype(np.float32) * 0.05)
    mw_pl = jnp.asarray(rng.standard_normal((c_mid, dim_w)).astype(np.float32) * 0.05)
    mw_fl = jnp.asarray(rng.standard_normal((c_mid, dim_w)).astype(np.float32) * 0.05)
    mb_up = jnp.ones((c_in,), jnp.float32)
    mb_pl = jnp.ones((c_mid,), jnp.float32)
    b_up = jnp.asarray(rng.standard_normal(c_mid).astype(np.float32) * 0.1)
    b_pl = jnp.asarray(rng.standard_normal(c_mid).astype(np.float32) * 0.1)

    @jax.jit
    def unfolded(x, style):
        o = modulated_conv2d_cl(x, style, w_up, mw_up, mb_up,
                                demodulate=True, up=True)
        o = fused_leaky_relu_cl(o, b_up)
        o = modulated_conv2d_cl(o, style, w_pl, mw_pl, mb_pl,
                                demodulate=True)
        o = fused_leaky_relu_cl(o, b_pl)
        return modulated_conv2d_cl(o, style, w_fl, mw_fl, mb_pl,
                                   demodulate=False)

    @jax.jit
    def folded(x, style):
        f = up_modconv_folded(x, style, w_up, mw_up, mb_up)
        f = lrelu_folded(f, b_up)
        f = modconv_folded(f, style, w_pl, mw_pl, mb_pl)
        f = lrelu_folded(f, b_pl)
        f = modconv1x1_folded(f, style, w_fl, mw_fl, mb_pl)
        return unfold2x2(f, 3)

    ref = unfolded(x, style)
    got = folded(x, style)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    amp = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    t_u = bench(unfolded, x, style)
    t_f = bench(folded, x, style)
    print(f"b={b} {h}²x{c_in} -> {2*h}²x{c_mid} -> flow3: "
          f"unfolded {t_u:.2f} ms, folded {t_f:.2f} ms "
          f"({t_u/t_f:.2f}x), max|err|={err:.3e} (|ref|max {amp:.2f})")


if __name__ == "__main__":
    main()
