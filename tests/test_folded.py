"""Folded (space-to-depth) last-level conv forms vs the NHWC ops.

Every folded op must match its ops/nhwc.py equivalent exactly (f32):
the folded layout changes memory layout only, never math.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from float_tpu.ops.folded import (
    fold2x2, unfold2x2, up_modconv_folded, modconv_folded,
    modconv1x1_folded, lrelu_folded,
)
from float_tpu.ops.nhwc import modulated_conv2d_cl, fused_leaky_relu_cl


def _mk(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_fold_unfold_roundtrip(rng):
    x = _mk(rng, 2, 16, 16, 8)
    assert jnp.array_equal(unfold2x2(fold2x2(x), 8), x)
    # folded lane order is phase-major: lane (a*2+p)*C + c
    f = fold2x2(x)
    np.testing.assert_array_equal(
        np.asarray(f[0, 3, 4, 1 * 8 + 5]), np.asarray(x[0, 6, 9, 5]))


@pytest.mark.parametrize("in_c,out_c", [(16, 8), (8, 8)])
def test_up_modconv_folded(rng, in_c, out_c):
    b, h = 3, 16
    x = _mk(rng, b, h, h, in_c) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, out_c, in_c, 3, 3) * 0.2
    mw = _mk(rng, in_c, 32) * 0.2
    mb = jnp.ones((in_c,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=True, up=True)
    got = unfold2x2(up_modconv_folded(x, style, w, mw, mb), out_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_modconv_folded_plain(rng):
    b, h, c_in, c_out = 2, 16, 8, 8
    x = _mk(rng, b, 2 * h, 2 * h, c_in) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, c_out, c_in, 3, 3) * 0.2
    mw = _mk(rng, c_in, 32) * 0.2
    mb = jnp.ones((c_in,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=True)
    got = unfold2x2(modconv_folded(fold2x2(x), style, w, mw, mb), c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_modconv_folded_boundary_exact(rng):
    # the folded zero-pad of ONE folded pixel must reproduce the
    # image-space 1-pixel zero pad: check with an all-ones input where
    # border effects dominate
    b, h, c = 1, 8, 4
    x = jnp.ones((b, 2 * h, 2 * h, c), jnp.float32)
    style = _mk(rng, b, 16)
    w = _mk(rng, 1, c, c, 3, 3)
    mw = _mk(rng, c, 16) * 0.2
    mb = jnp.ones((c,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=False)
    got = unfold2x2(modconv_folded(fold2x2(x), style, w, mw, mb,
                                   demodulate=False), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_modconv1x1_folded(rng):
    b, h, c_in, c_out = 2, 16, 8, 3
    x = _mk(rng, b, 2 * h, 2 * h, c_in) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, c_out, c_in, 1, 1) * 0.3
    mw = _mk(rng, c_in, 32) * 0.2
    mb = jnp.ones((c_in,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=False)
    got = unfold2x2(modconv1x1_folded(fold2x2(x), style, w, mw, mb), c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_lrelu_folded(rng):
    x = _mk(rng, 2, 16, 16, 3)
    bias = _mk(rng, 3)
    ref = fused_leaky_relu_cl(x, bias)
    got = unfold2x2(lrelu_folded(fold2x2(x), bias), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_wfold_roundtrip_is_reshape(rng):
    from float_tpu.ops.folded import wfold, wunfold
    x = _mk(rng, 2, 8, 16, 4)
    f = wfold(x)
    assert f.shape == (2, 8, 8, 8)
    assert jnp.array_equal(wunfold(f), x)
    # lane px*C + c
    np.testing.assert_array_equal(np.asarray(f[0, 3, 2, 1 * 4 + 2]),
                                  np.asarray(x[0, 3, 5, 2]))


def test_up_modconv_wfolded(rng):
    from float_tpu.ops.folded import up_modconv_wfolded, wunfold
    b, h, c_in, c_out = 3, 8, 8, 4
    x = _mk(rng, b, h, h, c_in) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, c_out, c_in, 3, 3) * 0.2
    mw = _mk(rng, c_in, 32) * 0.2
    mb = jnp.ones((c_in,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=True, up=True)
    got = wunfold(up_modconv_wfolded(x, style, w, mw, mb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_modconv_wfolded_plain(rng):
    from float_tpu.ops.folded import wfold, wunfold, modconv_wfolded
    b, h, c = 2, 16, 6
    x = _mk(rng, b, h, h, c) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, c, c, 3, 3) * 0.2
    mw = _mk(rng, c, 32) * 0.2
    mb = jnp.ones((c,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=True)
    got = wunfold(modconv_wfolded(wfold(x), style, w, mw, mb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)
    # boundary: all-ones input stresses the folded zero pad
    ones = jnp.ones_like(x)
    ref1 = modulated_conv2d_cl(ones, style, w, mw, mb, demodulate=False)
    got1 = wunfold(modconv_wfolded(wfold(ones), style, w, mw, mb,
                                   demodulate=False))
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=0, atol=2e-4)


def test_modconv1x1_and_equal_wfolded(rng):
    from float_tpu.ops.folded import (wfold, wunfold, modconv1x1_wfolded,
                                      equal_conv1x1_wfolded)
    from float_tpu.ops.nhwc import equal_conv2d_cl
    b, h, c = 2, 8, 6
    x = _mk(rng, b, h, h, c) * 0.5
    style = _mk(rng, b, 32)
    w = _mk(rng, 1, 3, c, 1, 1) * 0.3
    mw = _mk(rng, c, 32) * 0.2
    mb = jnp.ones((c,), jnp.float32)
    ref = modulated_conv2d_cl(x, style, w, mw, mb, demodulate=False)
    got = wunfold(modconv1x1_wfolded(wfold(x), style, w, mw, mb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
    we = _mk(rng, 3, c, 1, 1) * 0.3
    ref2 = equal_conv2d_cl(x, we)
    got2 = wunfold(equal_conv1x1_wfolded(wfold(x), we))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=0, atol=1e-4)


def test_full_folded_level_chain(rng):
    """The whole folded last-level chain (up-conv -> lrelu -> plain conv
    -> lrelu -> 1x1 flow conv) == the unfolded NHWC chain."""
    b, h, c_in, c_mid = 3, 16, 16, 8
    x = _mk(rng, b, h, h, c_in) * 0.5
    style = _mk(rng, b, 32)
    w_up = _mk(rng, 1, c_mid, c_in, 3, 3) * 0.2
    w_pl = _mk(rng, 1, c_mid, c_mid, 3, 3) * 0.2
    w_fl = _mk(rng, 1, 3, c_mid, 1, 1) * 0.3
    mw_up, mw_pl, mw_fl = (_mk(rng, c_in, 32) * 0.2,
                           _mk(rng, c_mid, 32) * 0.2,
                           _mk(rng, c_mid, 32) * 0.2)
    mb = jnp.ones((c_in,), jnp.float32)
    mbm = jnp.ones((c_mid,), jnp.float32)
    b_up, b_pl = _mk(rng, c_mid), _mk(rng, c_mid)

    ref = modulated_conv2d_cl(x, style, w_up, mw_up, mb,
                              demodulate=True, up=True)
    ref = fused_leaky_relu_cl(ref, b_up)
    ref = modulated_conv2d_cl(ref, style, w_pl, mw_pl, mbm, demodulate=True)
    ref = fused_leaky_relu_cl(ref, b_pl)
    ref = modulated_conv2d_cl(ref, style, w_fl, mw_fl, mbm, demodulate=False)

    f = up_modconv_folded(x, style, w_up, mw_up, mb)
    f = lrelu_folded(f, b_up)
    f = modconv_folded(f, style, w_pl, mw_pl, mbm)
    f = lrelu_folded(f, b_pl)
    f = modconv1x1_folded(f, style, w_fl, mw_fl, mbm)
    got = unfold2x2(f, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-4)


def test_synthesis_wfold_mid_equivalence(rng, monkeypatch):
    """synthesis_cl with the W-folded middle-level branch == the plain
    branch, end-to-end at a size that triggers it (res>=128, 2C<=128)."""
    from float_tpu.models import init as minit
    from float_tpu.models import synthesis as S

    small = {4: 32, 8: 32, 16: 32, 32: 32, 64: 16, 128: 8, 256: 8}
    monkeypatch.setattr(minit, "CHANNELS_MAP", small)
    dec = minit.init_synthesis(256, 32, 20, seed=2)
    feats_cl = [_mk(rng, 1, r, r, small[r]) * 0.5
                for r in (8, 16, 32, 64, 128, 256)]
    wa = _mk(rng, 2, 32)

    monkeypatch.setattr(S, "WFOLD_MID", True)
    got, flow = S.synthesis_cl(dec, wa, feats_cl, 256,
                               use_warp_kernel=False)
    monkeypatch.setattr(S, "WFOLD_MID", False)
    ref, flow_r = S.synthesis_cl(dec, wa, feats_cl, 256,
                                 use_warp_kernel=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(flow_r),
                               rtol=0, atol=2e-4)
