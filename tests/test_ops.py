"""Kernel-layer parity tests against torch oracles.

torch (CPU) serves as the numerical oracle for F.conv2d / F.grid_sample /
F.interpolate semantics; the oracle code here is written from the op
*specifications*, not copied from the reference repo.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from float_tpu.ops import (
    fused_leaky_relu, upfirdn2d, make_blur_kernel, upsample2x, downsample2x,
    equal_linear, equal_conv2d, modulated_conv2d, grid_sample_bilinear,
    identity_grid, linear_interpolate_time, nearest_interpolate_time,
    odeint_fixed,
)


def torch_upfirdn2d(x, k, up=1, down=1, pad=(0, 0)):
    """Oracle: zero-stuff upsample -> pad -> FIR -> decimate (spec from
    StyleGAN2 upfirdn2d semantics)."""
    x = torch.as_tensor(x)
    k = torch.as_tensor(k)
    n, c, h, w = x.shape
    kh, kw = k.shape
    out = x.reshape(n, c, h, 1, w, 1)
    out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1])
    out = out.reshape(n, c, h * up, w * up)
    p0, p1 = pad
    out = F.pad(out, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
    out = out[:, :, max(-p0, 0): out.shape[2] - max(-p1, 0),
              max(-p0, 0): out.shape[3] - max(-p1, 0)]
    out = out.reshape(n * c, 1, out.shape[2], out.shape[3])
    w_ = torch.flip(k, [0, 1]).reshape(1, 1, kh, kw)
    out = F.conv2d(out, w_)
    out = out.reshape(n, c, out.shape[2], out.shape[3])
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)), (2, 1, (1, 1)),
    (1, 1, (0, 0)), (1, 2, (1, 1)),
])
def test_upfirdn2d_matches_torch(rng, up, down, pad):
    x = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    k = np.array([1., 3., 3., 1.], np.float32)
    k2 = np.outer(k, k) / np.outer(k, k).sum()
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2), up, down, pad))
    ref = torch_upfirdn2d(x, k2, up, down, pad).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_negative_pad(rng):
    x = rng.standard_normal((1, 2, 10, 10)).astype(np.float32)
    k2 = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32)
    k2 /= k2.sum()
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2), 1, 1, (-1, 2)))
    ref = torch_upfirdn2d(x, k2, 1, 1, (-1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_up_down_sample_round(rng):
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    up = np.asarray(upsample2x(jnp.asarray(x)))
    assert up.shape == (2, 4, 32, 32)
    dn = np.asarray(downsample2x(jnp.asarray(x)))
    assert dn.shape == (2, 4, 8, 8)


def test_fused_leaky_relu(rng):
    x = rng.standard_normal((2, 5, 4, 4)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xt = torch.as_tensor(x) + torch.as_tensor(b).reshape(1, 5, 1, 1)
    ref = (F.leaky_relu(xt, 0.2) * math.sqrt(2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_equal_linear(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    w = rng.standard_normal((6, 8)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    got = np.asarray(equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    scale = 1 / math.sqrt(8)
    ref = (torch.as_tensor(x) @ (torch.as_tensor(w) * scale).T + torch.as_tensor(b)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # activation variant
    got_a = np.asarray(equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                    activation=True))
    ref_a = (F.leaky_relu(torch.as_tensor(x) @ (torch.as_tensor(w) * scale).T
                          + torch.as_tensor(b), 0.2) * math.sqrt(2)).numpy()
    np.testing.assert_allclose(got_a, ref_a, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,padding,ks", [(1, 1, 3), (2, 0, 3), (1, 0, 1), (1, 0, 4)])
def test_equal_conv2d(rng, stride, padding, ks):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    w = rng.standard_normal((5, 3, ks, ks)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    got = np.asarray(equal_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                  stride=stride, padding=padding))
    scale = 1 / math.sqrt(3 * ks * ks)
    ref = F.conv2d(torch.as_tensor(x), torch.as_tensor(w) * scale,
                   torch.as_tensor(b), stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def torch_modulated_conv2d(x, style, weight, mod_w, mod_b, demodulate, up):
    """Oracle implementing the StyleGAN2 modulated conv spec with per-sample
    grouped conv (the mathematically defining formulation)."""
    x, style = torch.as_tensor(x), torch.as_tensor(style)
    weight = torch.as_tensor(weight)
    b, in_c, h, w_sp = x.shape
    _, out_c, _, kh, kw = weight.shape
    scale = 1 / math.sqrt(in_c * kh * kw)
    mod_scale = 1 / math.sqrt(mod_w.shape[1])
    s = style @ (torch.as_tensor(mod_w) * mod_scale).T + torch.as_tensor(mod_b)
    wmod = scale * weight * s.reshape(b, 1, in_c, 1, 1)
    if demodulate:
        demod = torch.rsqrt(wmod.pow(2).sum([2, 3, 4]) + 1e-8)
        wmod = wmod * demod.reshape(b, out_c, 1, 1, 1)
    if up:
        xg = x.reshape(1, b * in_c, h, w_sp)
        wt = wmod.transpose(1, 2).reshape(b * in_c, out_c, kh, kw)
        out = F.conv_transpose2d(xg, wt, stride=2, padding=0, groups=b)
        return out.reshape(b, out_c, out.shape[2], out.shape[3])
    wg = wmod.reshape(b * out_c, in_c, kh, kw)
    xg = x.reshape(1, b * in_c, h, w_sp)
    out = F.conv2d(xg, wg, padding=kh // 2, groups=b)
    return out.reshape(b, out_c, out.shape[2], out.shape[3])


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_plain(rng, demodulate):
    b, in_c, out_c, sd, ks = 2, 6, 8, 16, 3
    x = rng.standard_normal((b, in_c, 8, 8)).astype(np.float32)
    style = rng.standard_normal((b, sd)).astype(np.float32)
    w = rng.standard_normal((1, out_c, in_c, ks, ks)).astype(np.float32)
    mw = rng.standard_normal((in_c, sd)).astype(np.float32)
    mb = np.ones(in_c, np.float32)
    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(style), jnp.asarray(w),
        jnp.asarray(mw), jnp.asarray(mb), demodulate=demodulate))
    ref = torch_modulated_conv2d(x, style, w, mw, mb, demodulate, up=False).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_up(rng, demodulate):
    """Upsample path: conv_transpose stride 2 + blur."""
    b, in_c, out_c, sd, ks = 2, 4, 5, 8, 3
    x = rng.standard_normal((b, in_c, 6, 6)).astype(np.float32)
    style = rng.standard_normal((b, sd)).astype(np.float32)
    w = rng.standard_normal((1, out_c, in_c, ks, ks)).astype(np.float32)
    mw = rng.standard_normal((in_c, sd)).astype(np.float32)
    mb = np.ones(in_c, np.float32)
    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(style), jnp.asarray(w),
        jnp.asarray(mw), jnp.asarray(mb), demodulate=demodulate, up=True))
    # oracle: conv_transpose then the reference's Blur
    raw = torch_modulated_conv2d(x, style, w, mw, mb, demodulate, up=True)
    factor, blur_kernel = 2, [1, 3, 3, 1]
    p = (len(blur_kernel) - factor) - (ks - 1)
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2 + 1
    k2 = np.outer(blur_kernel, blur_kernel).astype(np.float32)
    k2 = k2 / k2.sum() * (factor ** 2)
    ref = torch_upfirdn2d(raw.numpy(), k2, 1, 1, (pad0, pad1)).numpy()
    assert got.shape == ref.shape == (b, out_c, 12, 12)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_grid_sample_matches_torch(rng):
    x = rng.standard_normal((2, 3, 9, 9)).astype(np.float32)
    # grid including out-of-bounds coords
    g = (rng.random((2, 7, 7, 2)).astype(np.float32) * 2.6 - 1.3)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(g)))
    ref = F.grid_sample(torch.as_tensor(x), torch.as_tensor(g),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_identity_grid_matches_reference_spec():
    g = np.asarray(identity_grid(5))
    xs = np.linspace(-1, 1, 5, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    np.testing.assert_allclose(g[..., 0], gx)
    np.testing.assert_allclose(g[..., 1], gy)


def test_linear_interpolation_matches_torch(rng):
    x = rng.standard_normal((2, 13, 5)).astype(np.float32)
    for out_len in (7, 13, 29, 1):
        got = np.asarray(linear_interpolate_time(jnp.asarray(x), out_len))
        ref = F.interpolate(torch.as_tensor(x).transpose(1, 2), size=out_len,
                            mode="linear", align_corners=True
                            ).transpose(1, 2).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"out_len={out_len}")


def test_nearest_interpolation_matches_torch(rng):
    x = rng.standard_normal((2, 5, 3)).astype(np.float32)
    for out_len in (12, 5, 3):
        got = np.asarray(nearest_interpolate_time(jnp.asarray(x), out_len))
        ref = F.interpolate(torch.as_tensor(x).transpose(1, 2), size=out_len,
                            mode="nearest").transpose(1, 2).numpy()
        np.testing.assert_allclose(got, ref, rtol=0, atol=0,
                                   err_msg=f"out_len={out_len}")


@pytest.mark.parametrize("method,order", [
    ("euler", 1), ("midpoint", 2), ("heun2", 2), ("heun3", 3), ("rk4", 4),
])
def test_ode_convergence(method, order):
    """dy/dt = -y, y(0)=1 -> y(1)=e^-1; error should shrink with order."""
    f = lambda t, y: -y
    y0 = jnp.ones(())
    errs = []
    for n in (4, 7):  # 3 and 6 steps: coarse enough to stay above f32 eps
        ts = jnp.linspace(0.0, 1.0, n)
        y1 = odeint_fixed(f, y0, ts, method=method)
        errs.append(abs(float(y1) - math.exp(-1)))
    # halving step size should reduce error ~2^order
    ratio = errs[0] / max(errs[1], 1e-16)
    assert ratio > 2 ** order * 0.5, (method, errs, ratio)


def test_ode_matches_torchdiffeq_euler():
    """Parity: nfe grid points => nfe-1 steps (torchdiffeq grid semantics)."""
    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    f = lambda t, y: y @ A.T
    y0 = jnp.asarray([1.0, 0.0])
    ts = jnp.linspace(0.0, 1.0, 10)
    y = np.asarray(odeint_fixed(f, y0, ts, method="euler"))
    # manual euler with 9 steps
    yt = np.array([1.0, 0.0], np.float64)
    An = np.asarray(A, np.float64)
    tgrid = np.linspace(0, 1, 10)
    for i in range(9):
        dt = tgrid[i + 1] - tgrid[i]
        yt = yt + dt * (yt @ An.T)
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


def test_ode_trajectory_layout():
    f = lambda t, y: jnp.ones_like(y)
    y0 = jnp.zeros((3,))
    ts = jnp.linspace(0.0, 1.0, 5)
    traj = odeint_fixed(f, y0, ts, method="euler", return_trajectory=True)
    assert traj.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.ones(3), rtol=1e-6)


@pytest.mark.parametrize("scale,desc", [(0.004, "small flow (within D)"),
                                        (0.8, "large flow (fallback)")])
def test_shift_warp_matches_gather(rng, scale, desc):
    from float_tpu.ops.warp_shifts import grid_sample_bilinear_shifts
    from float_tpu.ops import identity_grid
    feat = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    grid = identity_grid(32)[None] + jnp.asarray(
        rng.standard_normal((2, 32, 32, 2)).astype(np.float32) * scale)
    got = grid_sample_bilinear_shifts(feat, grid, max_disp=2)
    ref = grid_sample_bilinear(feat, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5, err_msg=desc)


def test_shift_warp_exact_integer_coords(rng):
    """Exact-integer sample positions (hat weight exactly 1/0).

    Note identity_grid under align_corners=False is NOT an identity map
    (pixel i samples at i*H/(H-1) - 0.5), so compare against the gather
    path, plus a hand-built truly-integer grid.
    """
    from float_tpu.ops.warp_shifts import grid_sample_bilinear_shifts
    h = 16
    feat = jnp.asarray(rng.standard_normal((1, 4, h, h)).astype(np.float32))
    # grid hitting exact integer pixel centers: g = (2p + 1)/H - 1
    p = jnp.arange(h, dtype=jnp.float32)
    g1d = (2 * p + 1) / h - 1
    gx, gy = jnp.meshgrid(g1d, g1d)
    grid = jnp.stack([gx, gy], -1)[None]
    got = grid_sample_bilinear_shifts(feat, grid, max_disp=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(feat),
                               rtol=1e-5, atol=1e-5)
