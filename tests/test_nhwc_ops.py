"""NHWC op variants == NCHW ops (transposed)."""
import numpy as np
import jax.numpy as jnp
import pytest

from float_tpu.ops import (equal_conv2d, fused_leaky_relu, modulated_conv2d,
                           upfirdn2d, upsample2x, make_blur_kernel,
                           grid_sample_bilinear, identity_grid)
from float_tpu.ops.nhwc import (equal_conv2d_cl, fused_leaky_relu_cl,
                                modulated_conv2d_cl, upfirdn2d_cl,
                                upsample2x_cl, grid_sample_bilinear_nhwc,
                                warp_cl)


def _t(x):  # NCHW -> NHWC
    return jnp.transpose(x, (0, 2, 3, 1))


def test_equal_conv2d_cl(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 6, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    ref = equal_conv2d(x, w, b, stride=1, padding=1)
    got = equal_conv2d_cl(_t(x), w, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=1e-4, atol=1e-5)


def test_fused_leaky_relu_cl(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    ref = fused_leaky_relu(x, b)
    got = fused_leaky_relu_cl(_t(x), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (2, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1))])
def test_upfirdn2d_cl(rng, up, down, pad):
    x = jnp.asarray(rng.standard_normal((2, 3, 12, 12)).astype(np.float32))
    k = make_blur_kernel((1, 3, 3, 1))
    ref = upfirdn2d(x, k, up, down, pad)
    got = upfirdn2d_cl(_t(x), k, up, down, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=1e-5, atol=1e-5)


def test_upsample2x_cl(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(upsample2x_cl(_t(x))),
                               np.asarray(_t(upsample2x(x))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("demod,up", [(True, False), (False, False),
                                      (True, True)])
def test_modulated_conv2d_cl(rng, demod, up):
    b, in_c, out_c, sd = 2, 6, 8, 16
    x = jnp.asarray(rng.standard_normal((b, in_c, 8, 8)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((b, sd)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, out_c, in_c, 3, 3)).astype(np.float32))
    mw = jnp.asarray(rng.standard_normal((in_c, sd)).astype(np.float32))
    mb = jnp.ones(in_c)
    ref = modulated_conv2d(x, style, w, mw, mb, demodulate=demod, up=up)
    got = modulated_conv2d_cl(_t(x), style, w, mw, mb, demodulate=demod, up=up)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=2e-4, atol=2e-4)


def test_grid_sample_nhwc(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 9, 9)).astype(np.float32))
    g = jnp.asarray((rng.random((2, 7, 7, 2)) * 2.6 - 1.3).astype(np.float32))
    ref = grid_sample_bilinear(x, g)
    got = grid_sample_bilinear_nhwc(_t(x), g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=1e-4, atol=1e-5)


def test_warp_cl_dispatch_small_uses_gather(rng):
    """Below 128² (or f32) warp_cl must take the exact gather path."""
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    g = identity_grid(32)[None] + 0.01
    got = warp_cl(_t(x), jnp.broadcast_to(g, (2, 32, 32, 2)))
    ref = grid_sample_bilinear(x, jnp.broadcast_to(g, (2, 32, 32, 2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(_t(ref)),
                               rtol=1e-4, atol=1e-5)


def test_fused_up_blur_matches_two_step():
    """FUSE_UP_BLUR composes the post-upsample blur into the transposed
    conv kernel; both forms are the same linear operator (measured e2e
    the two-step form wins on v5e — see ops/nhwc.py)."""
    import float_tpu.ops.nhwc as NH
    rng = np.random.default_rng(7)
    b, c_in, c_out, hw = 2, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c_in)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, c_out, c_in, 3, 3)).astype(np.float32))
    mw = jnp.asarray(rng.standard_normal((c_in, 4)).astype(np.float32))
    mb = jnp.asarray(rng.standard_normal((c_in,)).astype(np.float32))

    old = NH.FUSE_UP_BLUR
    try:
        # the ASYMMETRIC kernel pins the correlation-composition direction
        # (upfirdn flips its kernel internally, so corr(wt, k2) is the
        # correct composed kernel — a flip error would mirror the blur)
        for bk in ((1, 3, 3, 1), (1, 2, 4, 1)):
            NH.FUSE_UP_BLUR = False
            ref = NH.modulated_conv2d_cl(x, style, w, mw, mb,
                                         demodulate=True, up=True,
                                         blur_kernel=bk)
            NH.FUSE_UP_BLUR = True
            fused = NH.modulated_conv2d_cl(x, style, w, mw, mb,
                                           demodulate=True, up=True,
                                           blur_kernel=bk)
            assert ref.shape == fused.shape == (b, 2 * hw, 2 * hw, c_out)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4,
                                       err_msg=f"blur_kernel={bk}")
    finally:
        NH.FUSE_UP_BLUR = old
