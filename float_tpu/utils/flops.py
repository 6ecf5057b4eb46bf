"""Analytic FLOP accounting — MFU bookkeeping for bench.py.

Counts the multiply-accumulate work (2 FLOPs per MAC) of the hot stages
from the architecture alone, so achieved TFLOP/s and MFU can be derived
from measured throughput without profiler traces (which distort e2e ~3x
on this transport, PERF.md "Measurement methodology").

Conventions:
- MXU work (convs / linears / attention matmuls) is counted exactly from
  the layer shapes; this is the numerator MFU conventionally uses.
- VPU elementwise work (warp tap FMAs, blur taps, activations,
  modulation scaling) is reported SEPARATELY (``vpu_flops``): it rides
  the 8x128 vector unit, not the 128x128 systolic array, so folding it
  into an MXU-peak ratio would overstate utilization.

Peak: TPU v5e (v5 lite) = 197 TFLOP/s bf16 per chip (public spec,
tables in jax-ml.github.io/scaling-book).

Reference architecture being accounted: the Synthesis decoder
(/root/reference/src/nodes/models/float/styledecoder.py:447-534) and the
FMT (/root/reference/src/nodes/models/float/FMT.py:201-340).
"""
from __future__ import annotations

import math
from typing import Dict

from ..config import CHANNELS_MAP, FloatConfig

V5E_BF16_PEAK_FLOPS = 197e12


def synthesis_flops_per_level(size: int = 512, dim_w: int = 512,
                              channels_map: Dict[int, int] = None) -> list:
    """Per-LEVEL (res², MXU FLOPs, VPU FLOPs) of one Synthesis decode —
    the analytic side of the fusion-lane MXU/VPU decomposition
    (experiments/chunk_breakdown.py classify_fusions is the measured
    side).  Level 4 is conv1; 8..size are the pyramid levels."""
    cm = channels_map or CHANNELS_MAP

    def conv(h, w, cin, cout, k):
        return 2.0 * h * w * cin * cout * k * k

    out = []
    c4 = cm[4]
    # conv1: 3x3 at 4² (+ modulation + demod + lrelu)
    out.append((4, conv(4, 4, c4, c4, 3), 3 * 4 * 4 * c4 * 2.0))

    n_levels = int(math.log2(size)) - 2   # 8² .. size²
    inc = c4
    for lvl in range(n_levels):
        res = 2 ** (lvl + 3)
        outc = cm[res]
        h = w = res
        mxu = vpu = 0.0
        # up StyledConv: transposed 3x3 producing res² from (res/2)²
        # = res²·inc·outc·9 MACs (stride-2 transposed conv touches each
        # output once per tap), + 4-tap² separable blur (upfirdn)
        mxu += conv(h, w, inc, outc, 3)
        vpu += 2.0 * h * w * outc * (4 + 4)      # separable 4-tap x/y
        # second StyledConv 3x3
        mxu += conv(h, w, outc, outc, 3)
        # modulation scaling + demod + fused lrelu on both convs
        vpu += 2 * (3.0 * h * w * outc * 2)
        # ToFlow: ModulatedConv2d 1x1 out->3 (+ tanh/sigmoid + grid add)
        mxu += conv(h, w, outc, 3, 1)
        vpu += 6.0 * h * w * 2
        # warp: bilinear taps on the feat map — fast4/fast6 recentered
        # kernel runs 16-36 tap FMAs/pixel at kernel levels, exact-4-tap
        # gather elsewhere; account the production mix at 25 taps/pixel
        # for kernel levels (fast5), 4 elsewhere
        from ..models.synthesis import n_kernel_levels
        taps = 25 if lvl >= n_levels - n_kernel_levels(size) else 4
        vpu += 2.0 * h * w * outc * taps
        # mask merge: feat_warp*mask + input*(1-mask)
        vpu += 4.0 * h * w * outc
        # ToRGB 1x1 out->3 + skip upsample blur on 3ch
        mxu += conv(h, w, outc, 3, 1)
        vpu += 2.0 * h * w * 3 * 8
        out.append((res, mxu, vpu))
        inc = outc
    return out


def synthesis_flops_per_frame(size: int = 512, dim_w: int = 512,
                              channels_map: Dict[int, int] = None) -> dict:
    """Per-frame FLOPs of one Synthesis decode at ``size``².

    Structure (models/synthesis.py synthesis_cl, mirroring reference
    styledecoder.py:447-534): ConstantInput 4² -> conv1 (3x3) -> per
    level [up StyledConv 3x3 (2x), StyledConv 3x3, ToFlow 1x1, warp,
    ToRGB 1x1 + skip upsample].
    """
    levels = synthesis_flops_per_level(size, dim_w, channels_map)
    mxu = sum(m for _r, m, _v in levels)
    vpu = sum(v for _r, _m, v in levels)
    return {"mxu_flops": mxu, "vpu_flops": vpu, "total_flops": mxu + vpu}


def fmt_flops_per_forward(cfg: FloatConfig = FloatConfig(),
                          cfg_batch: int = 3) -> float:
    """One CFG-batched FMT forward (reference FMT.py:271-340):
    tokens n = num_prev_frames + num_frames_for_clip, width dim_h,
    ``cfg_batch``-way batch (3-way CFG default)."""
    n = cfg.num_prev_frames + cfg.num_frames_for_clip
    d = cfg.dim_h
    per_token_block = (
        2.0 * d * 3 * d        # qkv
        + 2.0 * d * d          # attn out proj
        + 2.0 * d * 4 * d * 2  # MLP fc1+fc2 (mlp_ratio 4)
        + 2.0 * d * 6 * d      # adaLN modulation (SiLU -> 6d)
    )
    attn = 2.0 * 2.0 * n * n * d     # QK^T + AV
    per_block = n * per_token_block + attn
    # embedders + head (x_embed, c_embed, t_embed MLP, decoder head)
    dim_c = cfg.dim_w + cfg.dim_a + cfg.dim_e
    embed = n * (2.0 * cfg.dim_w * d + 2.0 * dim_c * d + 2.0 * d * cfg.dim_w
                 + 2.0 * d * 2 * d)  # head adaLN
    embed += 2.0 * 256 * d + 2.0 * d * d   # t_embedder MLP (once per call)
    return cfg_batch * (cfg.fmt_depth * per_block + embed)


def sampling_flops_per_clip(t_frames: int, cfg: FloatConfig = FloatConfig(),
                            cfg_batch: int = 3) -> float:
    """Chunked CFG-ODE sampling cost: ceil(T/clip) chunks x (nfe-1)
    solver steps x stage evals (euler: 1 eval/step)."""
    from ..ops.ode import ODE_TABLEAUS
    n_chunks = math.ceil(t_frames / cfg.num_frames_for_clip)
    evals_per_step = len(ODE_TABLEAUS[cfg.ode_method][2])
    steps = (cfg.nfe - 1) * evals_per_step
    return n_chunks * steps * fmt_flops_per_forward(cfg, cfg_batch)


def decode_mfu(fps: float, size: int = 512,
               peak: float = V5E_BF16_PEAK_FLOPS) -> dict:
    """Measured decode throughput -> achieved TFLOP/s + MFU (MXU work
    only; VPU warp/blur work reported alongside, not in the ratio)."""
    f = synthesis_flops_per_frame(size)
    return {
        "gflop_per_frame_mxu": round(f["mxu_flops"] / 1e9, 2),
        "gflop_per_frame_vpu": round(f["vpu_flops"] / 1e9, 2),
        "achieved_tflops": round(f["mxu_flops"] * fps / 1e12, 2),
        "mfu": round(f["mxu_flops"] * fps / peak, 4),
    }
