"""Time variants of the 256²-level packed-warp output UNPACK on chip.

The production unpack (shift_warp_v2.warp_shared_feat_v2 packed→per-frame:
reshape → transpose(0,3,1,2,4) → reshape) compiles to a slice fusion +
a pad/maximum interleave with 2-wide windows (~1.9 ms/chunk traced, vs a
~0.7 ms HBM floor).  Each variant is timed INSIDE a jit that also
consumes the result with the production mask-merge (isolated relayouts
can be layout-assigned away; PERF.md measurement traps).

Run: python experiments/unpack_bench.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


B, H, W, CG, G = 16, 256, 256, 64, 2
NBG = B // G


def consume(out, mask, x):
    """Production consumer: mask-merge (runtime decode's _to_flow_cl)."""
    fw = out * mask
    merged = fw + x * (1.0 - mask)
    return fw, merged


def v_transpose(packed, mask, x):
    out = packed.reshape(NBG, H, W, G, CG)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, H, W, CG)
    return consume(out, mask, x)


def v_concat(packed, mask, x):
    out = jnp.concatenate([packed[..., g * CG:(g + 1) * CG]
                           for g in range(G)], axis=0)
    # concat orders groups as [g0 frames..., g1 frames...]; production
    # frame order is interleaved (bg, g) -> bg*G+g.  For TIMING the merge
    # cost is order-independent; the production swap would permute
    # mask/x instead (free: they are (B,H,W,1)/(B,H,W,CG) gathers of
    # per-frame tensors at dispatch time).
    return consume(out, mask, x)


def v_merge_packed(packed, mask_p, x_p):
    """Merge IN the packed layout (mask/x pre-packed as (NBG,H,W,128));
    unpack only the merged tensor."""
    fw_p = packed * mask_p
    merged_p = fw_p + x_p * (1.0 - mask_p)
    out = merged_p.reshape(NBG, H, W, G, CG)
    merged = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, H, W, CG)
    fw = jnp.transpose(fw_p.reshape(NBG, H, W, G, CG),
                       (0, 3, 1, 2, 4)).reshape(B, H, W, CG)
    return fw, merged


def time_fn(fn, args, n=30):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(r[1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(r[1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((NBG, H, W, 128)),
                         jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, H, W, 1)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H, W, CG)), jnp.bfloat16)
    mask_p = jnp.asarray(rng.random((NBG, H, W, 128)), jnp.bfloat16)
    x_p = jnp.asarray(rng.standard_normal((NBG, H, W, 128)), jnp.bfloat16)

    print("device:", jax.devices()[0].device_kind)
    for name, fn, args in [
        ("transpose (production)", v_transpose, (packed, mask, x)),
        ("lane-slice concat", v_concat, (packed, mask, x)),
        ("merge packed, unpack merged", v_merge_packed,
         (packed, mask_p, x_p)),
    ]:
        ms = time_fn(fn, args)
        print(f"{ms:7.2f} ms  {name}")

    # exactness: concat variant == transpose variant modulo frame order
    # (concat emits frame vals[i] at slot i; feed it mask/x in that order)
    vals = np.asarray([bg * G + g for g in range(G) for bg in range(NBG)])
    a = jax.jit(v_transpose)(packed, mask, x)[1]
    b_c = jax.jit(v_concat)(packed, mask[vals], x[vals])[1]
    np.testing.assert_allclose(np.asarray(a, np.float32)[vals],
                               np.asarray(b_c, np.float32),
                               atol=1e-2)
    print("concat variant exact (order-permuted)")


if __name__ == "__main__":
    main()
