"""Analytic FLOP accounting (utils/flops.py) — the MFU bookkeeping must
track the architecture, not drift from it."""
import math

from float_tpu.config import FloatConfig, CHANNELS_MAP
from float_tpu.utils.flops import (
    synthesis_flops_per_frame, fmt_flops_per_forward,
    sampling_flops_per_clip, decode_mfu, V5E_BF16_PEAK_FLOPS)


def test_synthesis_flops_512():
    """The 512² decode is ~71 GFLOP/frame of MXU work: the two 3x3 convs
    at each of the four big levels dominate (hand check below)."""
    f = synthesis_flops_per_frame(512)
    # hand-counted conv MACs*2 for the dominant terms:
    up512 = 2 * 512 * 512 * 64 * 32 * 9           # 64ch -> 32ch at 512²
    conv512 = 2 * 512 * 512 * 32 * 32 * 9
    assert f["mxu_flops"] > up512 + conv512       # plus all other levels
    assert 65e9 < f["mxu_flops"] < 80e9
    assert f["vpu_flops"] < 0.05 * f["mxu_flops"]  # warp/blur are VPU-light
    assert f["total_flops"] == f["mxu_flops"] + f["vpu_flops"]


def test_synthesis_flops_scale_with_resolution():
    """Each level halves channels as resolution doubles, so per-level
    conv work is ~constant at the top: dropping the 512² level removes
    ~one level's share (~20 GF), not 4x."""
    f512 = synthesis_flops_per_frame(512)["mxu_flops"]
    f256 = synthesis_flops_per_frame(256)["mxu_flops"]
    assert 1.2 < f512 / f256 < 2.0


def test_fmt_flops_per_forward():
    """60-token, 1024-wide, depth-8, 3-way-CFG forward: the reference's
    156.7 M-param FMT at ~2 FLOPs/param/token gives the right order."""
    cfg = FloatConfig()
    f = fmt_flops_per_forward(cfg, cfg_batch=3)
    n = cfg.num_prev_frames + cfg.num_frames_for_clip
    d = cfg.dim_h
    lower = 3 * cfg.fmt_depth * n * (2 * d * 3 * d)    # qkv alone
    assert f > lower
    assert 30e9 < f < 90e9
    # 1-way batch is exactly a third of the block cost
    f1 = fmt_flops_per_forward(cfg, cfg_batch=1)
    assert abs(f - 3 * f1) < 1e-6 * f


def test_sampling_flops_counts_chunks_and_steps():
    cfg = FloatConfig()          # nfe=10 euler -> 9 evals per chunk
    per_fwd = fmt_flops_per_forward(cfg)
    f250 = sampling_flops_per_clip(250, cfg)
    assert abs(f250 - 5 * 9 * per_fwd) < 1e-6 * f250
    # rk4 = 4 evals per step
    f_rk4 = sampling_flops_per_clip(250, cfg.replace(ode_method="rk4"))
    assert abs(f_rk4 - 4 * f250) < 1e-6 * f_rk4


def test_decode_mfu_derivation():
    m = decode_mfu(445.5, 512)
    f = synthesis_flops_per_frame(512)["mxu_flops"]
    assert abs(m["achieved_tflops"] - f * 445.5 / 1e12) < 0.01
    assert abs(m["mfu"] - f * 445.5 / V5E_BF16_PEAK_FLOPS) < 1e-3
    assert 0.1 < m["mfu"] < 0.3              # the measured regime
