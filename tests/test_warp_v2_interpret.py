"""v2 shift-warp kernel exactness on CPU via the Pallas TPU INTERPRET mode.

The Mosaic kernels cannot compile on XLA:CPU, so kernel exactness was
previously an on-chip-gate-only property (tools/verify_kernels_on_chip.py).
jax's TPU interpret mode (pltpu.force_tpu_interpret_mode) simulates the
grid, VMEM/SMEM scratch and manual DMA semantics well enough to run the
REAL kernel body on CPU — these tests pin, per commit:

  - auto-path exactness vs the XLA gather oracle (reference semantics:
    styledecoder.py:423 grid_sample, align_corners=False),
  - every recentered fast tier (fast3/4/5/6): exact when the local spread
    fits its capacity, honest spread reporting when it does not,
  - the optimistic overflow flag + the exact-gather fixup beyond D,
  - the packed output form + block-diagonal ToRGB contraction.

Each interpret-mode call costs ~2-4 s on CPU, so shapes stay at the
smallest kernel-eligible level (128², 8 frames).
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

from float_tpu.ops.pallas.shift_warp_v2 import (
    warp_shared_feat_v2, warp_shared_feat_v2_packed,
    warp_shared_feat_v2_packed_rgb)
from float_tpu.ops.nhwc import grid_sample_bilinear_nhwc, flow_needed_disp

B, H = 8, 128
BF16_FLOOR = 6.3e-2


def smooth_grid(key, b, h, w, amp_px):
    """Identity grid + a smooth flow of the given max pixel amplitude."""
    small = jax.random.normal(key, (b, h // 32, w // 32, 2))
    small = small / jnp.max(jnp.abs(small)) * amp_px
    flow = jax.image.resize(small, (b, h, w, 2), "bilinear")
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ident = jnp.stack([gx, gy], -1)[None]
    return (ident + flow * jnp.asarray([2.0 / w, 2.0 / h])).astype(jnp.float32)


def _feat(c, seed=0):
    return jax.random.normal(jax.random.key(seed), (1, H, H, c), jnp.bfloat16)


def _oracle(feat, grid):
    return grid_sample_bilinear_nhwc(
        jnp.broadcast_to(feat, (B,) + feat.shape[1:]), grid)


def _err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


@pytest.mark.parametrize("c,amp", [(32, 0.7), (64, 1.4)])
def test_auto_path_exact(c, amp):
    """auto (per-tile cond chain) matches the gather oracle, and the
    optimistic flags are clean for within-D flows."""
    feat = _feat(c)
    grid = smooth_grid(jax.random.key(c), B, H, H, amp)
    ref = _oracle(feat, grid)
    with pltpu.force_tpu_interpret_mode():
        out, flags = warp_shared_feat_v2(feat, grid, max_disp=2,
                                         apply_fixup=False)
    assert _err(out, ref) < BF16_FLOOR
    assert int(flags[0]) == 0                       # no beyond-D overflow
    assert 0 <= int(flags[1]) <= 4                  # honest spread stat


def test_fast_tiers_exact_or_honest():
    """Every trace-time tier is exact iff the auto-measured spread fits its
    capacity; on a miss its own spread stat must report the true spread
    (the decode path ratchet's correctness contract)."""
    feat = _feat(32)
    grid = smooth_grid(jax.random.key(7), B, H, H, 1.6)
    ref = _oracle(feat, grid)
    with pltpu.force_tpu_interpret_mode():
        _, flags_auto = warp_shared_feat_v2(feat, grid, max_disp=2,
                                            apply_fixup=False)
    spread = int(flags_auto[1])
    assert int(flags_auto[0]) == 0, "pick a within-D amplitude"
    covered = 0
    for path, cap in (("fast3", 1), ("fast4", 2), ("fast5", 3),
                      ("fast6", 4)):
        with pltpu.force_tpu_interpret_mode():
            out, flags = warp_shared_feat_v2(feat, grid, max_disp=2,
                                             apply_fixup=False, path=path)
        assert int(flags[1]) == spread, (path, int(flags[1]), spread)
        if spread <= cap:
            covered += 1
            assert _err(out, ref) < BF16_FLOOR, path
    assert covered >= 1, f"amplitude gave spread {spread} > 4?"


def test_overflow_flag_and_fixup_beyond_d():
    """Flows beyond D must raise the overflow flag in optimistic mode and
    be EXACT through the cond-gather fixup in fixup mode."""
    feat = _feat(32, seed=3)
    grid = smooth_grid(jax.random.key(11), B, H, H, 4.5)
    assert int(flow_needed_disp(grid, H, H)) > 2
    ref = _oracle(feat, grid)
    with pltpu.force_tpu_interpret_mode():
        _, flags = warp_shared_feat_v2(feat, grid, max_disp=2,
                                       apply_fixup=False)
        fixed = warp_shared_feat_v2(feat, grid, max_disp=2,
                                    apply_fixup=True)
    assert int(flags[0]) > 0, "beyond-D flow must flag"
    assert _err(fixed, ref) < BF16_FLOOR


def test_d1_reports_no_spread_stat():
    """max_disp=1 has no recentering branch: the spread slot must report
    the -1 no-stat convention (0 would trick the path ratchet into
    selecting fast4 from a statistic that was never measured)."""
    feat = _feat(32, seed=4)
    grid = smooth_grid(jax.random.key(13), B, H, H, 0.4)
    with pltpu.force_tpu_interpret_mode():
        _, flags = warp_shared_feat_v2(feat, grid, max_disp=1,
                                       apply_fixup=False)
    assert int(flags[1]) == -1


def test_synthesis_packed_folded_vs_fixup(monkeypatch):
    """The PRODUCTION last-level composition (packed warp + block-diagonal
    ToRGB + space-to-depth FOLDED conv chain, models/synthesis) vs the
    always-fixup unpacked program, end-to-end through synthesis_cl on CPU.
    Previously this plumbing (skip-chain adds, folded bias tiling, mask
    commute) was only covered on-chip (verify_kernels_on_chip 2d)."""
    from float_tpu.models import init as minit
    from float_tpu.models import synthesis as S

    small = {4: 32, 8: 32, 16: 32, 32: 32, 64: 32, 128: 32}
    monkeypatch.setattr(minit, "CHANNELS_MAP", small)
    dec = minit.init_synthesis(128, 32, 20, seed=2)
    # shrink the flow-pred weights so the random-init flows stay within
    # D=2 (beyond-D chunks would be INVALID in optimistic mode by design)
    for lvl in dec["to_flows"]:
        conv = dec["to_flows"][lvl]["conv"]
        conv["weight"] = conv["weight"] * 0.05
    dt = jnp.bfloat16
    dec16 = jax.tree.map(lambda a: a.astype(dt), dec)
    rng = np.random.default_rng(9)
    feats = [jnp.asarray(rng.standard_normal((1, r, r, small[r]))
                         .astype(np.float32) * 0.5).astype(dt)
             for r in (8, 16, 32, 64, 128)]
    wa = jnp.asarray(rng.standard_normal((B, 32)).astype(np.float32)
                     * 0.3).astype(dt)

    assert S.FOLDED_LAST
    with pltpu.force_tpu_interpret_mode():
        img, _, stats, flags = S.synthesis_cl(
            dec16, wa, feats, 128, collect_flow_stats=True,
            apply_fixup=False)
        ref, _ = S.synthesis_cl(dec16, wa, feats, 128)
        img, ref = jax.block_until_ready((img, ref))
    fl = np.asarray(flags).reshape(-1, 2)
    assert fl.shape[0] == 1                    # one kernel level at 128²
    assert fl[0, 0] == 0, "flow beyond D — shrink the to_flow scale more"
    assert _err(img, ref) < BF16_FLOOR
    assert img.shape == (B, 128, 128, 3)


def test_decode_redo_splice_beyond_d(monkeypatch):
    """The optimistic decode's re-decode + splice with REAL kernels: big
    flows overflow the default D=2 on the first clip, the post-loop sync
    marks those chunks, and the spliced result must equal the always-
    fixup program (previously on-chip-only coverage: the forced
    underscaled-D test in PERF.md)."""
    from float_tpu.models import init as minit
    from float_tpu.runtime import decode as RD

    small = {4: 32, 8: 32, 16: 32, 32: 32, 64: 32, 128: 32}
    monkeypatch.setattr(minit, "CHANNELS_MAP", small)
    dec = minit.init_synthesis(128, 32, 20, seed=6)
    for lvl in dec["to_flows"]:
        conv = dec["to_flows"][lvl]["conv"]
        conv["weight"] = conv["weight"] * 10.0     # flows beyond D=2 (→ 3)
    rng = np.random.default_rng(21)
    feats = [jnp.asarray(rng.standard_normal((1, small[r], r, r))
                         .astype(np.float32) * 0.5)
             for r in (8, 16, 32, 64, 128)]
    s_r = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32) * 0.3)
    r_d = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32) * 0.3)

    RD._DISP_RATCHET.pop(128, None)
    RD._PATH_RATCHET.pop(128, None)
    try:
        with pltpu.force_tpu_interpret_mode():
            prod = RD.decode_latents(dec, s_r, feats, r_d, size=128,
                                     decode_batch=4,
                                     compute_dtype=jnp.bfloat16)
            prod = jax.block_until_ready(prod)
        # the probe must have seen the beyond-default flows
        assert RD._ratchet_get(128)[0] > 2, RD._ratchet_get(128)
        dt = jnp.bfloat16
        wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dt)
        feats_c = [jnp.transpose(f.astype(dt), (0, 2, 3, 1)) for f in feats]
        dec_c = RD._cast_params(dec, dt)
        refs = []
        with pltpu.force_tpu_interpret_mode():
            for c0 in (0, 4):
                refs.append(RD._decode_chunk(dec_c, wa[c0:c0 + 4], feats_c,
                                             128, fixup=True))
            refs = jax.block_until_ready(refs)
        ref = jnp.concatenate(refs, axis=0)
        assert _err(prod, ref) < BF16_FLOOR / 2    # frames are in [0, 1]
    finally:
        RD._DISP_RATCHET.pop(128, None)
        RD._PATH_RATCHET.pop(128, None)


def test_packed_form_and_rgb_contraction():
    """The packed output + block-diagonal ToRGB einsum (the production
    last-level form, models/synthesis._packed_warp_rgb) equals
    gather-warp + per-frame 1x1; the in-kernel contraction variant too."""
    c = 32
    feat = _feat(c, seed=5)
    grid = smooth_grid(jax.random.key(17), B, H, H, 0.9)
    wk = jax.random.normal(jax.random.key(19), (3, c), jnp.float32) * 0.2
    warped = _oracle(feat, grid)
    ref = jnp.einsum("bhwc,oc->bhwo", warped.astype(jnp.float32), wk)

    with pltpu.force_tpu_interpret_mode():
        packed, flags, groups = warp_shared_feat_v2_packed(
            feat, grid, max_disp=2)
    cg = 128 // groups
    wkp = wk if cg == c else jnp.pad(wk, ((0, 0), (0, cg - c)))
    wblk = jnp.kron(jnp.eye(groups, dtype=jnp.float32), wkp)
    rgb_p = jnp.einsum("bhwk,ok->bhwo", packed.astype(jnp.float32), wblk)
    rgb = rgb_p.reshape(B // groups, H, H, groups, 3)
    rgb = jnp.transpose(rgb, (0, 3, 1, 2, 4)).reshape(B, H, H, 3)
    assert _err(rgb, ref) < BF16_FLOOR * 2     # extra contraction rounding

    with pltpu.force_tpu_interpret_mode():
        rgb_k, flags_k, groups_k = warp_shared_feat_v2_packed_rgb(
            feat, grid, wk, max_disp=2)
    rgb2 = rgb_k.reshape(B // groups_k, H, H, groups_k, 4)[..., :3]
    rgb2 = jnp.transpose(rgb2, (0, 3, 1, 2, 4)).reshape(B, H, H, 3)
    assert _err(rgb2, ref) < BF16_FLOOR * 2
