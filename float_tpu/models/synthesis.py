"""Flow-warping StyleGAN2 synthesis decoder + Direction motion basis.

Functional re-design of the reference Synthesis/ToFlow/ToRGB/Direction
(reference: src/nodes/models/float/styledecoder.py:368-534).

Param pytree mirrors the checkpoint's ``motion_autoencoder.dec.*`` keys:

    direction.weight                 (512, dim_m)
    input.input                      (1, 512, 4, 4) learned constant
    conv1.{conv.weight, conv.modulation.weight/bias, activate.bias}
    convs.{0..2L-1}.…                StyledConv pairs (even = upsample)
    to_rgbs.{0..L-1}.{conv.0.weight, conv.1.bias, bias}
    to_flows.{0..L-1}.{conv.weight, conv.modulation.weight/bias, bias}

TPU notes: the per-frame decode is expressed batch-first — the caller feeds
a *frame batch* (the appearance latent + per-frame motion offsets) so every
modulated conv runs as one big MXU matmul across frames; the reference
decodes frame-by-frame with B=1 (FLOAT.py:113-169), which would waste >90%
of the MXU.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import (
    modulated_conv2d, fused_leaky_relu, equal_conv2d, upsample2x,
    grid_sample_bilinear, identity_grid,
)

# Run the packed last level's conv chain space-to-depth FOLDED at full
# lane occupancy (ops/folded.py) when 4·C fits the 128 lanes.  Measured
# on chip: the (B, 512², 32) chain is LAYOUT-bound at 25% occupancy and
# the folded form is 2.2x faster isolated (experiments/
# folded_level_bench.py); exactness covered by tests/test_folded.py.
FOLDED_LAST = True

# Contract the last-level ToRGB inside the warp kernel epilogue instead
# of the block-diagonal einsum on the packed output.  Measured e2e on
# chip: 460 vs 481 frames/s — OFF (see _packed_warp_rgb docstring).
RGB_IN_KERNEL = False

# Run middle levels whose channel count would waste half the 128 lanes
# (256² at C=64) in the 2×1 W-FOLDED layout (ops/folded.py): the fold is
# an index-identity reshape in NHWC, so only the warp output and the
# level exit pay a physical relayout while every conv IO and elementwise
# pass runs full-width.  Measured e2e on chip: 384 vs 452 frames/s
# same-session — OFF (the 2-conv-per-parity stacked up-conv and the
# folded↔unfolded relayouts around the full-res warp cost more than the
# half-lane occupancy they recover; the 256² level was never the
# bottleneck).  Kept as a tested alternative (tests/test_folded.py
# end-to-end equivalence) for channel maps where a mid level dominates.
WFOLD_MID = False


def direction(params, alpha):
    """Project motion magnitudes (…, dim_m) onto the orthonormalized basis.

    QR-orthonormalizes the learned (512, dim_m) basis then forms
    sum_i alpha_i * Q[:, i]  ==  alpha @ Q.T  (the reference's
    diag_embed+matmul+sum is exactly this contraction;
    reference: styledecoder.py:428-444).  If ``alpha`` is None, returns Q.

    QR note: jnp.linalg.qr and torch.linalg.qr both use Householder
    reflections (LAPACK convention), so column signs agree.
    """
    w = params["weight"].astype(jnp.float32) + 1e-8
    q, _ = jnp.linalg.qr(w)
    if alpha is None:
        return q
    return jnp.einsum("...m,dm->...d", alpha.astype(jnp.float32), q)


def _styled_conv(x, style, p, up: bool, blur_kernel=(1, 3, 3, 1)):
    """StyledConv: modulated conv (+opt. upsample) -> fused lrelu.

    NoiseInjection is identity at inference (noise=None;
    reference: styledecoder.py:275-287) so it is omitted; its zero-weight
    param is ignored on load.
    """
    out = modulated_conv2d(
        x, style,
        p["conv"]["weight"],
        p["conv"]["modulation"]["weight"],
        p["conv"]["modulation"]["bias"],
        demodulate=True, up=up, blur_kernel=blur_kernel,
    )
    return fused_leaky_relu(out, p["activate"]["bias"].reshape(-1))


def _to_rgb(x, p, skip=None, blur_kernel=(1, 3, 3, 1)):
    """ToRGB: EqualConv2d(k1)+fused-lrelu, +bias, +2x-upsampled skip.

    (reference: styledecoder.py:368-386 — note the ConvLayer here includes
    the activation, unlike classic StyleGAN2.)
    """
    out = equal_conv2d(x, p["conv"]["0"]["weight"], stride=1, padding=0)
    out = fused_leaky_relu(out, p["conv"]["1"]["bias"].reshape(-1))
    out = out + p["bias"].reshape(1, 3, 1, 1).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x(skip, blur_kernel)
    return out


def _to_flow(x, style, feat, p, skip=None, blur_kernel=(1, 3, 3, 1)):
    """ToFlow: predict (flow xy, mask) and warp ``feat`` onto the grid.

    Returns (feat_warp, merged, raw_out, flow) matching the reference
    contract (styledecoder.py:399-425):
      sampler = tanh(out[:, 0:2]); mask = sigmoid(out[:, 2:3])
      flow = sampler.xy + identity_grid
      feat_warp = grid_sample(feat, flow) * mask
      merged = feat_warp + x * (1 - mask)
    """
    out = modulated_conv2d(
        x, style,
        p["conv"]["weight"],
        p["conv"]["modulation"]["weight"],
        p["conv"]["modulation"]["bias"],
        demodulate=False,
    )
    out = out + p["bias"].reshape(1, 3, 1, 1).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x(skip, blur_kernel)

    size = x.shape[2]
    grid = identity_grid(size, dtype=jnp.float32)[None]
    sampler = jnp.tanh(out[:, 0:2].astype(jnp.float32))
    mask = jax.nn.sigmoid(out[:, 2:3].astype(jnp.float32))
    flow = jnp.transpose(sampler, (0, 2, 3, 1)) + grid          # (B, H, W, 2)

    feat_b = jnp.broadcast_to(feat, (x.shape[0],) + feat.shape[1:]) \
        if feat.shape[0] != x.shape[0] else feat
    feat_warp = grid_sample_bilinear(feat_b.astype(x.dtype), flow.astype(x.dtype))
    feat_warp = feat_warp * mask.astype(x.dtype)
    merged = feat_warp + x * (1.0 - mask).astype(x.dtype)
    return feat_warp, merged, out, flow


def synthesis(params, wa, feats, size: int, alpha=None,
              blur_kernel=(1, 3, 3, 1)):
    """Decode latent(s) into image(s).

    wa:    (B, style_dim) combined appearance+motion latent (s_r + r_d_t);
           the reference broadcasts it to all n_latent style slots
           (styledecoder.py:510-511) — with per-slot identical styles the
           repeat is free, so we just reuse ``wa`` per layer.
    feats: list of 7 encoder skip maps coarse-first, each (Bf, C, H, W)
           where Bf broadcasts against B (frame batching).
    alpha: optional motion-magnitude conditioning
           (reference styledecoder.py:497-506):
           - [alpha_d]: latent = wa + direction(alpha_d)
           - [target, source, start]: latent = wa + (dir(target) -
             dir(start)) + dir(source)  (motion transfer / editing path)
           The inference pipeline always passes None (wa already holds
           s_r + r_d_t).

    Returns (img (B, 3, S, S) in [-1, 1], flow at the 64² level).
    """
    if alpha is not None:
        if len(alpha) > 1:
            d_target = direction(params["direction"], alpha[0])
            d_source = direction(params["direction"], alpha[1])
            d_start = direction(params["direction"], alpha[2])
            wa = wa + (d_target - d_start) + d_source
        else:
            wa = wa + direction(params["direction"], alpha[0])
    wa = wa.astype(feats[0].dtype) if feats else wa
    b = wa.shape[0]
    log_size = int(math.log2(size))
    n_levels = log_size - 2                 # levels 8² .. size²

    const = params["input"]["input"]
    out = jnp.broadcast_to(const, (b,) + const.shape[1:]).astype(wa.dtype)
    out = _styled_conv(out, wa, params["conv1"], up=False,
                       blur_kernel=blur_kernel)

    convs = params["convs"]
    to_rgbs = params["to_rgbs"]
    to_flows = params["to_flows"]

    skip = None
    skip_flow = None
    flow64 = None
    for lvl in range(n_levels):
        out = _styled_conv(out, wa, convs[str(2 * lvl)], up=True,
                           blur_kernel=blur_kernel)
        out = _styled_conv(out, wa, convs[str(2 * lvl + 1)], up=False,
                           blur_kernel=blur_kernel)
        res = out.shape[2]
        if res == 8:
            out_warp, out, skip_flow, _ = _to_flow(
                out, wa, feats[lvl], to_flows[str(lvl)],
                blur_kernel=blur_kernel)
            skip = _to_rgb(out_warp, to_rgbs[str(lvl)],
                           blur_kernel=blur_kernel)
        else:
            out_warp, out, skip_flow, fl = _to_flow(
                out, wa, feats[lvl], to_flows[str(lvl)], skip_flow,
                blur_kernel=blur_kernel)
            if res == 64:
                flow64 = fl
            skip = _to_rgb(out_warp, to_rgbs[str(lvl)], skip,
                           blur_kernel=blur_kernel)

    return skip, flow64


# ---------------------------------------------------------------------------
# channels-last (NHWC) decode path — the TPU production path
# ---------------------------------------------------------------------------

def _styled_conv_cl(x, style, p, up: bool, blur_kernel=(1, 3, 3, 1)):
    from ..ops.nhwc import modulated_conv2d_cl, fused_leaky_relu_cl
    out = modulated_conv2d_cl(
        x, style,
        p["conv"]["weight"],
        p["conv"]["modulation"]["weight"],
        p["conv"]["modulation"]["bias"],
        demodulate=True, up=up, blur_kernel=blur_kernel,
    )
    return fused_leaky_relu_cl(out, p["activate"]["bias"].reshape(-1))


def _to_rgb_cl(x, p, skip=None, blur_kernel=(1, 3, 3, 1)):
    from ..ops.nhwc import equal_conv2d_cl, fused_leaky_relu_cl, upsample2x_cl
    out = equal_conv2d_cl(x, p["conv"]["0"]["weight"], stride=1, padding=0)
    out = fused_leaky_relu_cl(out, p["conv"]["1"]["bias"].reshape(-1))
    out = out + p["bias"].reshape(1, 1, 1, 3).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x_cl(skip, blur_kernel)
    return out


def _to_flow_cl(x, style, feat, p, skip=None, use_warp_kernel=True,
                blur_kernel=(1, 3, 3, 1), max_disp=2, apply_fixup=True,
                warp_path="auto"):
    # max_disp: static tap bound D of the shift-warp kernels at this level;
    # apply_fixup=False = optimistic mode (returns a 5th element: the
    # [beyond-D overflow, max spread] flags; see ops.nhwc.warp_cl);
    # warp_path: trace-time fast-path selection for the v2 kernel levels
    from ..ops.nhwc import modulated_conv2d_cl, upsample2x_cl, warp_cl
    out = modulated_conv2d_cl(
        x, style,
        p["conv"]["weight"],
        p["conv"]["modulation"]["weight"],
        p["conv"]["modulation"]["bias"],
        demodulate=False,
    )
    out = out + p["bias"].reshape(1, 1, 1, 3).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x_cl(skip, blur_kernel)

    size = x.shape[1]
    grid = identity_grid(size, dtype=jnp.float32)[None]
    sampler = jnp.tanh(out[..., 0:2].astype(jnp.float32))
    mask = jax.nn.sigmoid(out[..., 2:3].astype(jnp.float32))
    flow = sampler + grid                                   # (B, H, W, 2) xy

    shared = feat if (feat.shape[0] == 1 and x.shape[0] != 1) else None
    feat_b = jnp.broadcast_to(feat, (x.shape[0],) + feat.shape[1:]) \
        if feat.shape[0] != x.shape[0] else feat
    warped = warp_cl(feat_b.astype(x.dtype), flow.astype(jnp.float32),
                     use_kernel=use_warp_kernel, max_disp=max_disp,
                     shared_feat=None if shared is None
                     else shared.astype(x.dtype),
                     apply_fixup=apply_fixup, path=warp_path)
    ovf = None
    if not apply_fixup:
        warped, ovf = warped
    feat_warp = warped * mask.astype(x.dtype)
    merged = feat_warp + x * (1.0 - mask).astype(x.dtype)
    if not apply_fixup:
        return feat_warp, merged, out, flow, ovf
    return feat_warp, merged, out, flow


def _to_flow_rgb_packed_cl(x, style, feat, p_flow, p_rgb, skip_flow,
                           skip_rgb, blur_kernel=(1, 3, 3, 1), max_disp=2,
                           warp_path="auto"):
    """Fused LAST-level ToFlow+ToRGB consuming the warp kernel's packed
    lane layout (optimistic mode only).

    At the final level the merged feature is dead — the only warp
    consumer is ToRGB, whose 1×1 conv is pointwise-linear over channels:
    conv(warped · mask) == mask · conv(warped), and on the frame-lane-
    packed (B/groups, H, W, 128) kernel output it is a BLOCK-DIAGONAL
    matmul (kron(I_groups, W_rgb)).  So the full-resolution lane-unpack
    relayout (profiled ~8 ms/chunk at 512², as costly as the warp
    kernels) is skipped and only the 3-channel RGB is unpacked.

    Returns (rgb, flow_pred_out, flow, flags) — same flow contract as
    _to_flow_cl; math identical to _to_flow_cl + _to_rgb_cl
    (reference: styledecoder.py:368-425, composition at :517-529).
    """
    from ..ops.nhwc import modulated_conv2d_cl, upsample2x_cl

    out = modulated_conv2d_cl(
        x, style,
        p_flow["conv"]["weight"],
        p_flow["conv"]["modulation"]["weight"],
        p_flow["conv"]["modulation"]["bias"],
        demodulate=False,
    )
    out = out + p_flow["bias"].reshape(1, 1, 1, 3).astype(out.dtype)
    if skip_flow is not None:
        out = out + upsample2x_cl(skip_flow, blur_kernel)
    rgb, flow, flags = _packed_warp_rgb(
        out, feat, p_rgb, skip_rgb, x.dtype, x.shape[0],
        blur_kernel=blur_kernel, max_disp=max_disp, warp_path=warp_path)
    return rgb, out, flow, flags


def _packed_warp_rgb(out, feat, p_rgb, skip_rgb, dtype, b,
                     blur_kernel=(1, 3, 3, 1), max_disp=2,
                     warp_path="auto"):
    """Shared tail of the packed last level: flow-pred (B, S, S, 3) ->
    (tanh/sigmoid, warp packed, block-diag ToRGB, mask, skip).

    The in-kernel ToRGB contraction (RGB_IN_KERNEL;
    shift_warp_v2.warp_shared_feat_v2_packed_rgb) was measured e2e at
    460 vs 481 frames/s for the einsum form and is OFF: the per-tile
    (1024, 128)·(128, 16) MXU dots serialize against the VPU tap loop
    inside the kernel, costing more than the saved 268 MB HBM round
    trip.  Kept as a tested alternative for hardware where the balance
    differs (on-chip gate section 2c)."""
    from ..ops.nhwc import upsample2x_cl, fused_leaky_relu_cl

    size = out.shape[1]
    grid = identity_grid(size, dtype=jnp.float32)[None]
    sampler = jnp.tanh(out[..., 0:2].astype(jnp.float32))
    mask = jax.nn.sigmoid(out[..., 2:3].astype(jnp.float32))
    flow = sampler + grid

    c = feat.shape[-1]
    w0 = p_rgb["conv"]["0"]["weight"].astype(jnp.float32)   # (3, C, 1, 1)
    wk = w0[:, :, 0, 0] * (1.0 / math.sqrt(c))              # equalized scale
    if RGB_IN_KERNEL:
        from ..ops.pallas.shift_warp_v2 import (
            warp_shared_feat_v2_packed_rgb)
        rgb_p, flags, groups = warp_shared_feat_v2_packed_rgb(
            feat.astype(dtype), flow.astype(jnp.float32), wk,
            max_disp=max_disp, path=warp_path)
        rgb = rgb_p.reshape(b // groups, size, size, groups, 4)[..., :3]
    else:
        from ..ops.pallas.shift_warp_v2 import warp_shared_feat_v2_packed
        packed, flags, groups = warp_shared_feat_v2_packed(
            feat.astype(dtype), flow.astype(jnp.float32),
            max_disp=max_disp, path=warp_path)
        cg = 128 // groups
        wkp = wk if cg == c else jnp.pad(wk, ((0, 0), (0, cg - c)))
        wblk = jnp.kron(jnp.eye(groups, dtype=jnp.float32), wkp)  # (3g, 128)
        rgb_p = jnp.einsum("bhwk,ok->bhwo", packed,
                           wblk.astype(packed.dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
        rgb = rgb_p.reshape(b // groups, size, size, groups, 3)
    rgb = jnp.transpose(rgb, (0, 3, 1, 2, 4)).reshape(b, size, size, 3)
    rgb = rgb.astype(dtype)
    rgb = rgb * mask.astype(dtype)
    rgb = fused_leaky_relu_cl(rgb, p_rgb["conv"]["1"]["bias"].reshape(-1))
    rgb = rgb + p_rgb["bias"].reshape(1, 1, 1, 3).astype(rgb.dtype)
    if skip_rgb is not None:
        rgb = rgb + upsample2x_cl(skip_rgb, blur_kernel)
    return rgb, flow, flags


def _to_flow_rgb_packed_folded(f, style, feat, p_flow, p_rgb, skip_flow,
                               skip_rgb, blur_kernel=(1, 3, 3, 1),
                               max_disp=2, warp_path="auto"):
    """_to_flow_rgb_packed_cl on a space-to-depth FOLDED style branch.

    ``f`` is the last level's activation in the (B, S/2, S/2, 4·C) folded
    layout (ops/folded.py): the flow conv runs block-diagonally on the
    folded lanes and only the 3-channel flow prediction is unfolded —
    the quarter-width (B, S, S, C) tensor never exists.  Math identical
    to _to_flow_rgb_packed_cl (reference: styledecoder.py:368-425).
    """
    from ..ops.nhwc import upsample2x_cl
    from ..ops.folded import modconv1x1_folded, unfold2x2

    out_f = modconv1x1_folded(
        f, style,
        p_flow["conv"]["weight"],
        p_flow["conv"]["modulation"]["weight"],
        p_flow["conv"]["modulation"]["bias"])
    out_f = out_f + jnp.tile(p_flow["bias"].reshape(-1),
                             4).astype(out_f.dtype)
    out = unfold2x2(out_f, 3)
    if skip_flow is not None:
        out = out + upsample2x_cl(skip_flow, blur_kernel)
    rgb, flow, flags = _packed_warp_rgb(
        out, feat, p_rgb, skip_rgb, f.dtype, f.shape[0],
        blur_kernel=blur_kernel, max_disp=max_disp, warp_path=warp_path)
    return rgb, out, flow, flags


def _to_flow_cl_wfolded(f, style, feat, p, skip=None, use_warp_kernel=True,
                        blur_kernel=(1, 3, 3, 1), max_disp=2,
                        apply_fixup=True, warp_path="auto"):
    """_to_flow_cl on a 2×1 W-FOLDED style branch (ops/folded.py).

    ``f`` (B, H, W/2, 2C): the flow conv runs block-diagonally on the
    folded lanes (the unfold of its 3-channel output is an index-identity
    reshape), the warp runs at full resolution as usual, and the
    mask-merge happens in the folded layout so the merged feature stays
    W-folded for ToRGB/exit.  Math identical to _to_flow_cl
    (reference: styledecoder.py:399-425)."""
    from ..ops.nhwc import upsample2x_cl, warp_cl
    from ..ops.folded import modconv1x1_wfolded, wunfold

    out_f = modconv1x1_wfolded(
        f, style,
        p["conv"]["weight"],
        p["conv"]["modulation"]["weight"],
        p["conv"]["modulation"]["bias"])
    out = wunfold(out_f)                                  # (B, H, W, 3)
    out = out + p["bias"].reshape(1, 1, 1, 3).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x_cl(skip, blur_kernel)

    b, size = f.shape[0], out.shape[1]
    grid = identity_grid(size, dtype=jnp.float32)[None]
    sampler = jnp.tanh(out[..., 0:2].astype(jnp.float32))
    mask = jax.nn.sigmoid(out[..., 2:3].astype(jnp.float32))
    flow = sampler + grid

    shared = feat if (feat.shape[0] == 1 and b != 1) else None
    feat_b = jnp.broadcast_to(feat, (b,) + feat.shape[1:]) \
        if feat.shape[0] != b else feat
    warped = warp_cl(feat_b.astype(f.dtype), flow.astype(jnp.float32),
                     use_kernel=use_warp_kernel, max_disp=max_disp,
                     shared_feat=None if shared is None
                     else shared.astype(f.dtype),
                     apply_fixup=apply_fixup, path=warp_path)
    ovf = None
    if not apply_fixup:
        warped, ovf = warped

    c = feat.shape[-1]
    w2 = size // 2
    w5 = warped.reshape(b, size, w2, 2, c)
    m5 = mask.reshape(b, size, w2, 2, 1).astype(f.dtype)
    x5 = f.reshape(b, size, w2, 2, c)
    fw5 = w5 * m5
    merged5 = fw5 + x5 * (1.0 - m5)
    feat_warp_f = fw5.reshape(b, size, w2, 2 * c)
    merged_f = merged5.reshape(b, size, w2, 2 * c)
    if not apply_fixup:
        return feat_warp_f, merged_f, out, flow, ovf
    return feat_warp_f, merged_f, out, flow


def _to_rgb_wfolded(x_f, p, skip=None, blur_kernel=(1, 3, 3, 1)):
    """_to_rgb_cl on a W-FOLDED input: the 1×1 conv is kron(I₂, W) on the
    folded lanes; lrelu/bias/skip run on the (free-reshape) unfolded
    3-channel output."""
    from ..ops.nhwc import fused_leaky_relu_cl, upsample2x_cl
    from ..ops.folded import equal_conv1x1_wfolded, wunfold
    out = wunfold(equal_conv1x1_wfolded(x_f, p["conv"]["0"]["weight"]))
    out = fused_leaky_relu_cl(out, p["conv"]["1"]["bias"].reshape(-1))
    out = out + p["bias"].reshape(1, 1, 1, 3).astype(out.dtype)
    if skip is not None:
        out = out + upsample2x_cl(skip, blur_kernel)
    return out


def n_kernel_levels(size: int) -> int:
    """How many synthesis levels (>=128²) route to the shift-warp kernels."""
    return max(0, int(math.log2(size)) - 6)


def synthesis_cl(params, wa, feats_cl, size: int, use_warp_kernel: bool = True,
                 blur_kernel=(1, 3, 3, 1), warp_disp=2,
                 collect_flow_stats: bool = False,
                 apply_fixup: bool = True, warp_path="auto",
                 probe: bool = True):
    """Channels-last synthesis forward — identical math to `synthesis` but
    NHWC end-to-end so the warp kernels run without layout transposes.

    feats_cl: the 7 encoder skip maps in (Bf, H, W, C) layout (transpose
    them once per clip).  Returns (img (B, S, S, 3) in [-1, 1], flow64).

    use_warp_kernel (default ON) routes the >=128² warps to the
    generalized frame-lane-packed static-shift kernel (shift_warp_v2);
    ``warp_disp`` is the kernel's static tap bound D (exactness for flows
    beyond it comes from the cond-gather fixup).  The decode loop probes
    the clip's real flows via ``collect_flow_stats=True`` — which makes
    the return value (img, flow64, stats) where stats is an int32 vector
    of per-level needed displacements for the kernel levels (coarse
    first) — and re-dispatches with the smallest safe D.

    ``apply_fixup=False`` (optimistic mode; requires collect_flow_stats)
    skips the kernels' beyond-D fixup conds — a never-taken cond still
    pays XLA conditional-boundary copies — and returns
    (img, flow64, stats, flags) where flags is an int32 vector of
    per-kernel-level [overflow, max-spread] pairs (flattened, coarse level
    first): any overflow > 0 means this output is INVALID beyond-D and the
    caller must re-run with apply_fixup=True (runtime/decode.py's
    optimistic loop); the spread stat drives the trace-time path ratchet.

    ``warp_path``: 'auto' | 'fast4' | 'fast6', an int-per-level tuple like
    ``warp_disp`` — selects the v2 kernels' cond-free recentered path at
    trace time (ops/pallas/shift_warp_v2).  A fast-path output is exact
    iff its reported spread <= 2 / 4; the decode loop validates.
    """
    assert apply_fixup or collect_flow_stats, \
        "optimistic mode reports flags via the stats return"

    def _probe_stat(fl, res):
        # ``probe=False`` (steady-state decode): the displacement probe
        # is advisory-only — correctness and regime-change detection come
        # from the kernels' in-SMEM overflow/spread flags — so once the
        # warp ratchets converge the decode drops these fusions (~3 ms of
        # a ~55 ms 512² chunk, measured e2e +5.4%: experiments/
        # probe_lane_bench.py).  Zero stats never grow the monotone
        # ratchet; an overflow flag with a zero stat bumps D by 1
        # (decode._sync_stats_flags) and probing resumes.
        if probe:
            from ..ops.nhwc import flow_needed_disp
            return flow_needed_disp(fl[: min(2, fl.shape[0])], res, res)
        return jnp.asarray(0, jnp.int32)

    b = wa.shape[0]
    log_size = int(math.log2(size))
    n_levels = log_size - 2

    const = jnp.transpose(params["input"]["input"], (0, 2, 3, 1))
    out = jnp.broadcast_to(const, (b,) + const.shape[1:]).astype(wa.dtype)
    out = _styled_conv_cl(out, wa, params["conv1"], up=False,
                          blur_kernel=blur_kernel)

    convs = params["convs"]
    to_rgbs = params["to_rgbs"]
    to_flows = params["to_flows"]

    skip = None
    skip_flow = None
    flow64 = None
    flow_stats = []
    ovf_flags = []
    for lvl in range(n_levels):
        res = out.shape[1] * 2            # resolution after the up-conv
        # per-level static D: int broadcasts; a tuple is indexed by the
        # kernel-level index (128² -> 0, 256² -> 1, ...)
        if isinstance(warp_disp, tuple):
            lvl_d = warp_disp[int(math.log2(res)) - 7] if res >= 128 else 2
        else:
            lvl_d = warp_disp
        if isinstance(warp_path, tuple):
            lvl_p = warp_path[int(math.log2(res)) - 7] if res >= 128 else "auto"
        else:
            lvl_p = warp_path
        # fixup-free only for the kernel levels (>=128²): smaller levels
        # use the exact gather, where apply_fixup only changes arity
        lvl_fix = apply_fixup or res < 128
        is_last = lvl == n_levels - 1
        feat_l = feats_cl[lvl]
        from ..ops.pallas.shift_warp_v2 import v2_eligible
        packed_last = (is_last and not lvl_fix and use_warp_kernel
                       and feat_l.shape[0] == 1 and b > 1
                       and v2_eligible(feat_l.shape, wa.dtype))
        # the packed last level can additionally run its whole conv chain
        # space-to-depth FOLDED at full lane occupancy (ops/folded.py):
        # the quarter-width (B, S, S, C) activation never materializes
        folded_last = (FOLDED_LAST and packed_last
                       and 4 * feat_l.shape[-1] <= 128)
        if folded_last:
            from ..ops.folded import (up_modconv_folded, modconv_folded,
                                      lrelu_folded)
            p_up = convs[str(2 * lvl)]
            p_pl = convs[str(2 * lvl + 1)]
            f = up_modconv_folded(
                out, wa, p_up["conv"]["weight"],
                p_up["conv"]["modulation"]["weight"],
                p_up["conv"]["modulation"]["bias"], blur_kernel=blur_kernel)
            f = lrelu_folded(f, p_up["activate"]["bias"].reshape(-1))
            f = modconv_folded(
                f, wa, p_pl["conv"]["weight"],
                p_pl["conv"]["modulation"]["weight"],
                p_pl["conv"]["modulation"]["bias"])
            f = lrelu_folded(f, p_pl["activate"]["bias"].reshape(-1))
            skip, _, fl, ovf = _to_flow_rgb_packed_folded(
                f, wa, feat_l, to_flows[str(lvl)], to_rgbs[str(lvl)],
                skip_flow, skip, blur_kernel=blur_kernel,
                max_disp=lvl_d, warp_path=lvl_p)
            ovf_flags.append(ovf)
            if collect_flow_stats and res >= 128:
                flow_stats.append(_probe_stat(fl, res))
            continue
        # middle levels at half lane occupancy (256²/C=64): 2×1 W-folded
        # conv chain + folded merge; the fold boundaries are index-
        # identity reshapes (ops/folded.py)
        if (WFOLD_MID and not is_last and res >= 128
                and 2 * feat_l.shape[-1] <= 128):
            from ..ops.folded import (up_modconv_wfolded, modconv_wfolded,
                                      lrelu_folded, wunfold)
            p_up = convs[str(2 * lvl)]
            p_pl = convs[str(2 * lvl + 1)]
            f = up_modconv_wfolded(
                out, wa, p_up["conv"]["weight"],
                p_up["conv"]["modulation"]["weight"],
                p_up["conv"]["modulation"]["bias"], blur_kernel=blur_kernel)
            f = lrelu_folded(f, p_up["activate"]["bias"].reshape(-1),
                             phases=2)
            f = modconv_wfolded(
                f, wa, p_pl["conv"]["weight"],
                p_pl["conv"]["modulation"]["weight"],
                p_pl["conv"]["modulation"]["bias"])
            f = lrelu_folded(f, p_pl["activate"]["bias"].reshape(-1),
                             phases=2)
            res_out = _to_flow_cl_wfolded(
                f, wa, feat_l, to_flows[str(lvl)], skip_flow,
                use_warp_kernel=use_warp_kernel, blur_kernel=blur_kernel,
                max_disp=lvl_d, apply_fixup=lvl_fix, warp_path=lvl_p)
            if lvl_fix:
                out_warp_f, merged_f, skip_flow, fl = res_out
            else:
                out_warp_f, merged_f, skip_flow, fl, ovf = res_out
                ovf_flags.append(ovf)
            out = wunfold(merged_f)
            if collect_flow_stats and res >= 128:
                flow_stats.append(_probe_stat(fl, res))
            skip = _to_rgb_wfolded(out_warp_f, to_rgbs[str(lvl)], skip,
                                   blur_kernel=blur_kernel)
            continue
        out = _styled_conv_cl(out, wa, convs[str(2 * lvl)], up=True,
                              blur_kernel=blur_kernel)
        out = _styled_conv_cl(out, wa, convs[str(2 * lvl + 1)], up=False,
                              blur_kernel=blur_kernel)
        if res == 8:
            out_warp, out, skip_flow, _ = _to_flow_cl(
                out, wa, feats_cl[lvl], to_flows[str(lvl)],
                use_warp_kernel=use_warp_kernel, blur_kernel=blur_kernel,
                max_disp=lvl_d)
            skip = _to_rgb_cl(out_warp, to_rgbs[str(lvl)],
                              blur_kernel=blur_kernel)
        else:
            if packed_last:
                # last level: the merged feature is dead, ToRGB runs on
                # the kernel's packed lanes — skips the full-resolution
                # lane-unpack relayout (see _to_flow_rgb_packed_cl)
                skip, _, fl, ovf = _to_flow_rgb_packed_cl(
                    out, wa, feat_l, to_flows[str(lvl)], to_rgbs[str(lvl)],
                    skip_flow, skip, blur_kernel=blur_kernel,
                    max_disp=lvl_d, warp_path=lvl_p)
                ovf_flags.append(ovf)
            else:
                res_out = _to_flow_cl(
                    out, wa, feat_l, to_flows[str(lvl)], skip_flow,
                    use_warp_kernel=use_warp_kernel, blur_kernel=blur_kernel,
                    max_disp=lvl_d, apply_fixup=lvl_fix, warp_path=lvl_p)
                if lvl_fix:
                    out_warp, out, skip_flow, fl = res_out
                else:
                    out_warp, out, skip_flow, fl, ovf = res_out
                    ovf_flags.append(ovf)
            if res == 64:
                flow64 = fl
            if collect_flow_stats and res >= 128:
                # stats are advisory (the ratchet's D only sizes the fast
                # path; exactness comes from the fixup, and since r3 the
                # kernels' in-SMEM overflow flag bumps the ratchet when
                # the subset misses a big flow): a 2-frame subset keeps
                # the per-chunk probe cost minimal while still giving the
                # direct D jump on regime changes, and steady-state
                # dispatch drops the probe entirely (probe=False above)
                flow_stats.append(_probe_stat(fl, res))
            if not packed_last:
                skip = _to_rgb_cl(out_warp, to_rgbs[str(lvl)], skip,
                                  blur_kernel=blur_kernel)

    if collect_flow_stats:
        stats = (jnp.stack(flow_stats) if flow_stats
                 else jnp.zeros((0,), jnp.int32))
        if not apply_fixup:
            flags = (jnp.concatenate(ovf_flags) if ovf_flags
                     else jnp.zeros((0,), jnp.int32))
            return skip, flow64, stats, flags
        return skip, flow64, stats
    return skip, flow64
