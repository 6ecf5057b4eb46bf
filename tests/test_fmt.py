"""FMT parity vs a torch-functional oracle + sampler behavior tests.

The oracle implements the DiT adaLN-zero math directly with torch functional
ops from the spec (SURVEY §2.5); it shares no structure with the reference's
nn.Module code.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from float_tpu.config import FloatConfig
from float_tpu.models.fmt import (
    fmt_forward, fmt_forward_cfg, sinusoid_pos_embed, alignment_bias,
)
from float_tpu.models.init import init_fmt
from float_tpu.runtime.sampling import sample_motion_latents, pad_to_chunks

CFG = FloatConfig(dim_w=32, dim_a=32, dim_h=64, dim_e=7, fmt_depth=2,
                  num_heads=4, wav2vec_sec=0.4, fps=25.0, num_prev_frames=3)
# clip = 10 frames, total tokens 13


def _np(p):
    return {k: _np(v) for k, v in p.items()} if isinstance(p, dict) else \
        torch.as_tensor(np.asarray(p))


def oracle_fmt(params, t, x, wa, wr, we, prev_x, prev_wa, prev_we, cfg):
    """Torch-functional FMT forward (inference), written from the spec."""
    p = _np(params)
    lin = lambda q, v: F.linear(v, q["weight"], q["bias"])
    lnorm = lambda v: F.layer_norm(v, v.shape[-1:], eps=1e-6)
    modl = lambda v, sh, sc: v * (1 + sc) + sh

    x = torch.cat([prev_x, x], dim=1)
    wa = torch.cat([prev_wa, wa], dim=1)
    total = x.shape[1]
    if we.shape[1] > 1:
        we = torch.cat([prev_we, we], dim=1)
    else:
        we = we.expand(-1, total, -1)

    # timestep embedding: cos-first GLIDE table + MLP
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = lin(p["t_embedder"]["mlp"]["2"], F.silu(lin(p["t_embedder"]["mlp"]["0"], temb)))

    h = lin(p["x_embedder"]["proj"], x)
    pos = torch.as_tensor(np.asarray(sinusoid_pos_embed(total, h.shape[-1])))
    h = h + pos[None]

    wr_b = wr[:, None, :].expand(-1, total, -1)
    c = lin(p["c_embedder"], torch.cat([wr_b, wa, we], dim=-1))
    c = temb[:, None, :] + c

    bias = torch.as_tensor(np.asarray(alignment_bias(total, total, cfg.attention_window)))
    nh = cfg.num_heads
    for i in range(cfg.fmt_depth):
        bp = p["blocks"][str(i)]
        mod = lin(bp["adaLN_modulation"]["1"], F.silu(c)).chunk(6, dim=-1)
        sh1, sc1, g1, sh2, sc2, g2 = mod
        # attention
        xin = modl(lnorm(h), sh1, sc1)
        b, n, ch = xin.shape
        qkv = lin(bp["attn"]["qkv"], xin).reshape(b, n, 3, nh, ch // nh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / math.sqrt(ch // nh) + bias
        att = att.softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, ch)
        h = h + g1 * lin(bp["attn"]["proj"], out)
        # mlp
        xin = modl(lnorm(h), sh2, sc2)
        h = h + g2 * lin(bp["mlp"]["fc2"], F.gelu(lin(bp["mlp"]["fc1"], xin), approximate="tanh"))

    mod = lin(p["decoder"]["adaLN_modulation"]["1"], F.silu(c)).chunk(2, dim=-1)
    return lin(p["decoder"]["linear"], modl(lnorm(h), mod[0], mod[1]))


@pytest.fixture(scope="module")
def fmt_params():
    return init_fmt(CFG, seed=7)


def _rand_inputs(rng, b, dynamic=False):
    clip, prev = CFG.num_frames_for_clip, CFG.num_prev_frames
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    return dict(
        t=mk(1), x=mk(b, clip, CFG.dim_w), wa=mk(b, clip, CFG.dim_a),
        wr=mk(b, CFG.dim_w),
        we=mk(b, clip if dynamic else 1, CFG.dim_e),
        prev_x=mk(b, prev, CFG.dim_w), prev_wa=mk(b, prev, CFG.dim_a),
        prev_we=mk(b, prev, CFG.dim_e) if dynamic else None,
    )


@pytest.mark.parametrize("dynamic", [False, True])
def test_fmt_forward_parity(fmt_params, rng, dynamic):
    inp = _rand_inputs(rng, 2, dynamic)
    got = fmt_forward(
        fmt_params, **{k: (jnp.asarray(v) if v is not None else None)
                       for k, v in inp.items()},
        depth=CFG.fmt_depth, num_heads=CFG.num_heads,
        attention_window=CFG.attention_window)
    ref = oracle_fmt(
        fmt_params, **{k: (torch.as_tensor(v) if v is not None else None)
                       for k, v in inp.items()}, cfg=CFG)
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_cfg_combination(fmt_params, rng):
    """3-way CFG must equal the hand-combined independent forwards."""
    inp = _rand_inputs(rng, 2)
    j = {k: (jnp.asarray(v) if v is not None else None) for k, v in inp.items()}
    kw = dict(depth=CFG.fmt_depth, num_heads=CFG.num_heads,
              attention_window=CFG.attention_window)
    a_s, e_s = 2.0, 1.5
    got = fmt_forward_cfg(fmt_params, j["t"], j["x"], j["wa"], j["wr"], j["we"],
                          j["prev_x"], j["prev_wa"], None,
                          a_cfg_scale=a_s, e_cfg_scale=e_s, **kw)
    z = jnp.zeros_like
    uncond = fmt_forward(fmt_params, j["t"], j["x"], z(j["wa"]), j["wr"],
                         z(j["we"]), j["prev_x"], j["prev_wa"], None, **kw)
    all_c = fmt_forward(fmt_params, j["t"], j["x"], j["wa"], j["wr"], j["we"],
                        j["prev_x"], j["prev_wa"], None, **kw)
    audio = fmt_forward(fmt_params, j["t"], j["x"], j["wa"], j["wr"],
                        z(j["we"]), j["prev_x"], j["prev_wa"], None, **kw)
    ref = uncond + a_s * (audio - uncond) + e_s * (all_c - audio)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_cfg_skip_when_all_one(fmt_params, rng):
    inp = _rand_inputs(rng, 1)
    j = {k: (jnp.asarray(v) if v is not None else None) for k, v in inp.items()}
    kw = dict(depth=CFG.fmt_depth, num_heads=CFG.num_heads,
              attention_window=CFG.attention_window)
    got = fmt_forward_cfg(fmt_params, j["t"], j["x"], j["wa"], j["wr"], j["we"],
                          j["prev_x"], j["prev_wa"], None,
                          a_cfg_scale=1.0, e_cfg_scale=1.0, **kw)
    ref = fmt_forward(fmt_params, j["t"], j["x"], j["wa"], j["wr"], j["we"],
                      j["prev_x"], j["prev_wa"], None, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pad_to_chunks():
    x = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
    p = pad_to_chunks(x, 5)
    assert p.shape == (2, 10, 3)
    np.testing.assert_allclose(np.asarray(p[:, 7:]), np.asarray(x[:, 6:7]).repeat(3, 1))


def test_sampler_oracle_loop(fmt_params, rng):
    """Scan-based sampler == hand-written python chunk loop (same noise)."""
    b, t_frames = 1, 24      # 3 chunks of 10 (last padded), clip=10
    clip, prev = CFG.num_frames_for_clip, CFG.num_prev_frames
    n_chunks = math.ceil(t_frames / clip)
    wa = jnp.asarray(rng.standard_normal((b, t_frames, CFG.dim_a)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, CFG.dim_e)).astype(np.float32))
    r_s = jnp.asarray(rng.standard_normal((b, CFG.dim_w)).astype(np.float32))
    noise = rng.standard_normal((n_chunks, b, clip, CFG.dim_w)).astype(np.float32)

    got = sample_motion_latents(fmt_params, r_s, wa, we, cfg=CFG,
                                noise=noise, a_cfg_scale=2.0, e_cfg_scale=1.0)
    assert got.shape == (b, t_frames, CFG.dim_w)

    # oracle loop (python, per chunk, euler nfe=10 => 9 steps)
    kw = dict(depth=CFG.fmt_depth, num_heads=CFG.num_heads,
              attention_window=CFG.attention_window)
    wa_p = pad_to_chunks(wa, clip)
    prev_x = jnp.zeros((b, prev, CFG.dim_w))
    prev_wa = jnp.zeros((b, prev, CFG.dim_a))
    time = np.linspace(0, 1, CFG.nfe)
    outs = []
    for ci in range(n_chunks):
        wa_t = wa_p[:, ci * clip:(ci + 1) * clip]
        x = jnp.asarray(noise[ci])
        for si in range(CFG.nfe - 1):
            dt = time[si + 1] - time[si]
            vel = fmt_forward_cfg(fmt_params, jnp.asarray([time[si]], jnp.float32),
                                  x, wa_t, r_s, we, prev_x, prev_wa, None,
                                  a_cfg_scale=2.0, e_cfg_scale=1.0, **kw)[:, prev:]
            x = x + dt * vel
        outs.append(x)
        prev_x, prev_wa = x[:, -prev:], wa_t[:, -prev:]
    ref = jnp.concatenate(outs, axis=1)[:, :t_frames]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sampler_dynamic_emotion(fmt_params, rng):
    """Dynamic we: per-chunk slicing with prev_we carry, shapes + finiteness."""
    b, t_frames = 2, 17
    wa = jnp.asarray(rng.standard_normal((b, t_frames, CFG.dim_a)).astype(np.float32))
    we = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, t_frames, CFG.dim_e)).astype(np.float32)), -1)
    r_s = jnp.asarray(rng.standard_normal((b, CFG.dim_w)).astype(np.float32))
    out = sample_motion_latents(fmt_params, r_s, wa, we, cfg=CFG,
                                key=jax.random.key(0), a_cfg_scale=2.0,
                                e_cfg_scale=1.5)
    assert out.shape == (b, t_frames, CFG.dim_w)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_jit_compiles(fmt_params, rng):
    """Whole sampler under jit: one compiled program, deterministic."""
    b, t_frames = 1, 20
    wa = jnp.asarray(rng.standard_normal((b, t_frames, CFG.dim_a)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, CFG.dim_e)).astype(np.float32))
    r_s = jnp.asarray(rng.standard_normal((b, CFG.dim_w)).astype(np.float32))

    fn = jax.jit(lambda p, r, a, e, k: sample_motion_latents(
        p, r, a, e, cfg=CFG, key=k, a_cfg_scale=2.0))
    k = jax.random.key(3)
    o1 = fn(fmt_params, r_s, wa, we, k)
    o2 = fn(fmt_params, r_s, wa, we, k)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
