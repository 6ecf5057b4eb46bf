"""Pallas windowed warp kernel: CPU-interpret-mode correctness tests.

The kernel itself targets TPU; under the CPU test mesh we validate the
wrapper logic (overflow detection + fallback) and the kernel math in
Pallas interpreter mode on a small shape.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from float_tpu.ops.warp import grid_sample_bilinear_xla, identity_grid


def test_shift_kernel_supports_and_overflow():
    from float_tpu.ops.pallas import shift_warp_kernel as sk
    assert sk.supports((2, 32, 128, 128), (2, 128, 128, 2), jnp.bfloat16)
    assert not sk.supports((2, 32, 64, 64), (2, 64, 64, 2), jnp.bfloat16)
    assert not sk.supports((2, 32, 128, 128), (2, 128, 128, 2), jnp.float32)

    h = w = 128
    grid = identity_grid(h)[None] + 0.002        # sub-pixel flow
    ov = sk._overflow_mask(h, w, grid[..., 1], grid[..., 0], 3)
    assert not bool(jnp.any(ov))
    grid_big = identity_grid(h)[None] + 0.2      # ~13 px: beyond D=3
    ov2 = sk._overflow_mask(h, w, grid_big[..., 1], grid_big[..., 0], 3)
    assert bool(jnp.any(ov2))


def test_packed_kernel_dispatch_conditions():
    """warp_cl routes the shared-feat 512² case to the packed kernel only
    under the right conditions (CPU: just check the gather fallback path
    is taken and correct for f32)."""
    import numpy as np
    from float_tpu.ops.nhwc import warp_cl, grid_sample_bilinear_nhwc
    rng = np.random.default_rng(0)
    feat1 = jnp.asarray(rng.standard_normal((1, 32, 128, 8)).astype(np.float32))
    grid = jnp.broadcast_to(identity_grid(32)[None, :, :128 // 4][:, :, :128] if False
                            else jnp.zeros((4, 32, 128, 2)), (4, 32, 128, 2))
    feat_b = jnp.broadcast_to(feat1, (4,) + feat1.shape[1:])
    out = warp_cl(feat_b, grid, use_kernel=True, shared_feat=feat1)
    ref = grid_sample_bilinear_nhwc(feat_b, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
