"""shift_warp_v2 wrapper logic + adaptive-D machinery (CPU-checkable).

The kernel itself targets TPU (verified on-chip); these tests cover the
group-picking, the flow-displacement probe, and the decode ratchet.
"""
import numpy as np
import jax.numpy as jnp

from float_tpu.ops.nhwc import flow_needed_disp
from float_tpu.ops.pallas.shift_warp_v2 import pick_groups
from float_tpu.ops.warp import identity_grid
from float_tpu.models.synthesis import n_kernel_levels
from float_tpu.runtime import decode as D


def test_pick_groups():
    assert pick_groups(32, 16) == 4
    assert pick_groups(64, 16) == 2
    assert pick_groups(128, 16) == 1
    assert pick_groups(32, 6) == 2      # b not divisible by 4
    assert pick_groups(32, 3) == 1


def test_n_kernel_levels():
    assert n_kernel_levels(512) == 3    # 128², 256², 512²
    assert n_kernel_levels(256) == 2
    assert n_kernel_levels(128) == 1
    assert n_kernel_levels(64) == 0


def test_flow_needed_disp():
    h = w = 64
    grid = identity_grid(h)[None]
    # identity flow: align_corners=False intrinsic offset needs D=1
    assert int(flow_needed_disp(grid, h, w)) <= 1
    # +3.3 px displacement everywhere -> needs 3..4
    need = int(flow_needed_disp(grid + 3.3 * 2.0 / h, h, w))
    assert 3 <= need <= 4
    # huge flow lands outside the image -> irrelevant (zero padding)
    assert int(flow_needed_disp(grid + 3.0, h, w)) == 0


def test_disp_ratchet_monotone():
    D._DISP_RATCHET.pop(512, None)
    assert D._ratchet_get(512) == (2, 2, 2)
    got = D._ratchet_apply(512, jnp.asarray([1, 2, 3]))
    assert got == (2, 2, 3)             # floor 2, bumps only upward
    got = D._ratchet_apply(512, jnp.asarray([3, 1, 1]))
    assert got == (3, 2, 3)             # never decreases
    got = D._ratchet_apply(512, jnp.asarray([99, 99, 99]))
    # capped at the per-level COMPILE-PROVEN bounds (128²=7, 256²=6,
    # 512²=3 — experiments/warp_d_feasibility.py)
    assert got == D._disp_caps(512) == (7, 6, 3)
    # mismatched probe (different level count) is ignored
    assert D._ratchet_apply(512, jnp.asarray([5])) == (7, 6, 3)
    D._DISP_RATCHET.pop(512, None)


def test_seed_paths_merges_toward_safer():
    """A warp profile must never un-demote a path the running process
    already demoted (monotone like seed_ratchet): seeding fast4 over a
    live fast6 keeps fast6; seeding fast6 over fast4 upgrades safety."""
    size = 512
    D._PATH_RATCHET.pop(size, None)
    try:
        assert D.seed_paths(size, ("fast4", "fast6", "auto")) == \
            ("fast4", "fast6", "auto")
        # a second (stale) profile with less-safe paths must not win
        assert D.seed_paths(size, ("fast4", "fast4", "fast4")) == \
            ("fast4", "fast6", "auto")
        # but a safer profile upgrades
        assert D.seed_paths(size, ("fast6", "fast6", "auto")) == \
            ("fast6", "fast6", "auto")
        import pytest
        with pytest.raises(ValueError):
            D.seed_paths(size, ("fast4",))          # wrong level count
        with pytest.raises(ValueError):
            D.seed_paths(size, ("fast9", "auto", "auto"))
    finally:
        D._PATH_RATCHET.pop(size, None)


def test_decode_stats_empty_for_small_sizes(rng):
    """Sizes below 128² have no kernel levels: the probe returns an empty
    stats vector and the ratchet stays at its default."""
    from float_tpu.models import init as minit
    from float_tpu.models.synthesis import synthesis_cl
    params = minit.init_synthesis(64, 64, 20, 0)
    feats = [jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in
             [(1, 512, 8, 8), (1, 512, 16, 16), (1, 512, 32, 32),
              (1, 256, 64, 64)]]
    feats_c = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]
    wa = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    img, _, stats = synthesis_cl(params, wa, feats_c, 64,
                                 use_warp_kernel=False,
                                 collect_flow_stats=True)
    assert stats.shape == (0,)
    assert img.shape == (2, 64, 64, 3)


def test_ratchet_apply_max():
    """Per-chunk stats fold into the ratchet as an elementwise max with
    empty-stat chunks ignored (decode_latents collects one vector per
    chunk, single post-loop sync)."""
    D._DISP_RATCHET.pop(4096, None)
    stats = [jnp.asarray([2, 1, 3]), None, jnp.zeros((0,), jnp.int32),
             jnp.asarray([1, 4, 2])]
    # 4096 -> n_kernel_levels gives len-3 tuple? guard: use a size whose
    # level count matches the vectors
    size = 512
    assert n_kernel_levels(size) == 3
    D._DISP_RATCHET.pop(size, None)
    try:
        new = D._ratchet_apply_max(size, stats)
        # elementwise max over chunks, floored at the default D=2
        assert new == (2, 4, 3)
        # monotone: weaker later stats never lower it
        assert D._ratchet_apply_max(size, [jnp.asarray([1, 1, 1])]) == (2, 4, 3)
        # no stats at all -> unchanged
        assert D._ratchet_apply_max(size, [None]) == (2, 4, 3)
    finally:
        D._DISP_RATCHET.pop(size, None)


def test_overflow_mask_matches_needed_disp():
    """The fixup mask and the ratchet probe agree through the shared
    floor_disp_fields definition: a pixel overflows D iff the probe's
    needed displacement at that pixel exceeds D."""
    from float_tpu.ops.pallas.shift_warp_kernel import _overflow_mask
    from float_tpu.ops.nhwc import floor_disp_fields
    rng = np.random.default_rng(0)
    h = w = 32
    grid = jnp.asarray(identity_grid(h)[None]
                       + rng.normal(0, 0.2, (1, h, w, 2)).astype(np.float32))
    gy, gx = grid[..., 1], grid[..., 0]
    for d in (1, 2, 4):
        mask = np.asarray(_overflow_mask(h, w, gy, gx, d))
        dy, dx, rel = floor_disp_fields(gy, gx, h, w)
        ref = np.asarray(((dy > d) | (dx > d)) & rel)
        assert (mask == ref).all()
        # the probe bound covers every non-overflowing pixel
        need = int(flow_needed_disp(grid, h, w))
        if not mask.any():
            assert need <= d


def test_optimistic_redecode_splice():
    """decode_latents re-decodes exactly the flagged chunks with the
    fixup program and splices them in."""
    calls = []

    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True):
        ci = int(np.asarray(wa_c)[0, 0])
        calls.append((ci, fixup))
        img = jnp.full((wa_c.shape[0], 4, 4, 3),
                       ci * 10 + (0 if fixup else 1), jnp.float32)
        stats = jnp.asarray([2])
        # flags layout: per level [beyond-D ovf, max spread]
        flags = jnp.asarray([1 if ci == 2 else 0, 2])
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    D._DISP_RATCHET.pop(4, None)
    D._PATH_RATCHET.pop(4, None)
    r_d = jnp.repeat(jnp.arange(4, dtype=jnp.float32)[:, None], 8, axis=0)
    frames = D.decode_latents(
        {}, jnp.zeros((1, 1)), [], r_d.reshape(32, 1)[:, :1] * 0 +
        jnp.repeat(jnp.arange(4.0), 8)[:, None],
        size=4, decode_batch=8, chunk_fn=fake_fn)
    # chunk 2 was flagged: its frames come from the fixup=True pass
    vals = np.asarray(frames)[:, 0, 0, 0]
    assert (vals[:16] % 10 == 1).all()        # optimistic outputs
    assert (vals[16:24] % 10 == 0).all()      # re-decoded chunk
    assert (vals[24:] % 10 == 1).all()
    # exactly one fixup call, for chunk 2
    assert [c for c in calls if c[1]] == [(2, True)]
    # the fake probe's 1-entry stats/spread must NOT create ratchet
    # entries for size 4 (0 kernel levels): a recorded mismatched entry
    # poisons the warp-profile save->load roundtrip (seed_paths validates
    # lengths) for every later caller in the process
    assert 4 not in D._DISP_RATCHET and 4 not in D._PATH_RATCHET


def test_pessimist_switch_on_pinned_cap_overflow():
    """When a level keeps overflowing while its D ratchet is PINNED at
    the compile-proven cap, the next clips dispatch the fixup program as
    PRIMARY (one pass, no redo); the switch clears when a clip's probe
    stats fit the ratchet again."""
    calls = []
    mode = {"stats": 7}

    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True):
        calls.append(fixup)
        img = jnp.zeros((wa_c.shape[0], 4, 4, 3), jnp.float32)
        stats = jnp.asarray([mode["stats"]])
        flags = jnp.asarray([1, 2])          # always beyond-D
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    old_d = dict(D._DISP_RATCHET)
    old_p = dict(D._PESSIMIST)
    try:
        D._DISP_RATCHET[128] = (7,)          # pinned at the 128² cap
        D._PESSIMIST.pop(128, None)
        D._PATH_RATCHET.pop(128, None)
        r_d = jnp.zeros((16, 1))

        def clip():
            return D.decode_latents({}, jnp.zeros((1, 1)), [], r_d,
                                    size=128, decode_batch=8,
                                    chunk_fn=fake_fn)

        # clip 1: optimistic, every chunk flagged at the cap -> redo both
        # chunks AND flip the pessimist switch
        clip()
        assert calls == [False, False, True, True]
        assert D._pessimist_get(128)
        # clip 2: fixup-primary single pass; stats still at the cap so
        # the switch stays on
        calls.clear()
        clip()
        assert calls == [True, True]
        assert D._pessimist_get(128)
        # clip 3: flows calm down -> fold clears the switch
        mode["stats"] = 2
        calls.clear()
        clip()
        assert calls == [True, True]
        assert not D._pessimist_get(128)
    finally:
        D._DISP_RATCHET.clear()
        D._DISP_RATCHET.update(old_d)
        D._PESSIMIST.clear()
        D._PESSIMIST.update(old_p)
        D._PATH_RATCHET.pop(128, None)


def test_pessimist_clears_after_k_exact_fit_clips():
    """A flow regime whose needed D sits EXACTLY at the ratchet value
    (cap or floor) never produces a strict fit; the switch must still
    clear after _PESSIMIST_CLEAR_K consecutive fitting clips instead of
    pinning fixup-primary dispatch forever (ADVICE r4).  A non-fitting
    clip in between resets the streak."""
    stats_seq = {"v": 7}

    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True):
        img = jnp.zeros((wa_c.shape[0], 4, 4, 3), jnp.float32)
        stats = jnp.asarray([stats_seq["v"]])
        flags = jnp.asarray([1, 2])
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    old_d = dict(D._DISP_RATCHET)
    old_p = dict(D._PESSIMIST)
    try:
        D._DISP_RATCHET[128] = (7,)          # pinned at the 128² cap
        D._PESSIMIST[128] = True             # switch already tripped
        D._PESSIMIST_FIT.pop(128, None)
        D._PATH_RATCHET.pop(128, None)
        r_d = jnp.zeros((16, 1))

        def clip():
            D.decode_latents({}, jnp.zeros((1, 1)), [], r_d,
                             size=128, decode_batch=8, chunk_fn=fake_fn)

        k = D._PESSIMIST_CLEAR_K
        # k-1 exact-fit clips (m == D == cap): not yet cleared
        for _ in range(k - 1):
            clip()
            assert D._pessimist_get(128)
        # an over-cap clip resets the streak
        stats_seq["v"] = 8
        clip()
        assert D._pessimist_get(128) and D._PESSIMIST_FIT.get(128, 0) == 0
        # k consecutive exact fits clear it
        stats_seq["v"] = 7
        for i in range(k):
            assert D._pessimist_get(128), f"cleared too early at {i}"
            clip()
        assert not D._pessimist_get(128)
    finally:
        D._DISP_RATCHET.clear()
        D._DISP_RATCHET.update(old_d)
        D._PESSIMIST.clear()
        D._PESSIMIST.update(old_p)
        D._PESSIMIST_FIT.pop(128, None)
        D._PATH_RATCHET.pop(128, None)


def test_optimistic_redecode_to_host():
    """decode_latents_to_host re-decodes flagged chunks with the fixup
    program and re-drains them into the host buffer — including the
    uint8 wire scaling and last-chunk truncation."""
    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True):
        ci = int(np.asarray(wa_c)[0, 0])
        val = ci * 10 + (0 if fixup else 1)
        img = jnp.full((wa_c.shape[0], 4, 4, 3), val, jnp.float32)
        if out_u8:
            img = img.astype(jnp.uint8)
        stats = jnp.asarray([2])
        flags = jnp.asarray([1 if ci == 1 else 0, 2])
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    from float_tpu.runtime.decode import decode_latents_to_host
    D._DISP_RATCHET.pop(4, None)
    D._PATH_RATCHET.pop(4, None)
    r_d = jnp.repeat(jnp.arange(3.0), 8)[:, None][:20]   # 20 frames, 3 chunks
    out = decode_latents_to_host(
        {}, jnp.zeros((1, 1)), [], r_d, size=4, decode_batch=8,
        uint8_transfer=True, chunk_fn=fake_fn)
    assert out.shape == (20, 4, 4, 3)
    vals = out[:, 0, 0, 0] * 255.0          # undo the uint8 wire scaling
    assert np.allclose(vals[:8], 1)         # optimistic chunk 0
    assert np.allclose(vals[8:16], 10)      # chunk 1 re-decoded (fixup)
    assert np.allclose(vals[16:], 21)       # truncated last chunk, optimistic


def test_packed_torgb_blockdiag_math(rng=None):
    """The packed last-level ToRGB algebra: kron(I_groups, W)·packed ==
    per-frame 1x1 conv, and conv(warped·mask) == mask·conv(warped)."""
    import math
    rng = np.random.default_rng(4)
    groups, c, b, h = 4, 32, 16, 8
    cg = 128 // groups
    warped = rng.standard_normal((b, h, h, c)).astype(np.float32)
    mask = rng.random((b, h, h, 1)).astype(np.float32)
    w0 = rng.standard_normal((3, c)).astype(np.float32)
    scale = 1.0 / math.sqrt(c)

    # reference: per-frame equalized 1x1 conv of warped*mask
    ref = np.einsum("bhwc,oc->bhwo", warped * mask, w0 * scale)

    # pack frames into lanes the way the kernel does:
    # packed[bg, :, :, g*cg+ch] = warped[bg*groups+g, :, :, ch]
    packed = np.zeros((b // groups, h, h, 128), np.float32)
    for f in range(b):
        bg, g = f // groups, f % groups
        packed[bg, :, :, g * cg:g * cg + c] = warped[f]

    wblk = np.kron(np.eye(groups, dtype=np.float32), w0 * scale)
    rgb_p = np.einsum("bhwk,ok->bhwo", packed, wblk)
    rgb = rgb_p.reshape(b // groups, h, h, groups, 3)
    rgb = rgb.transpose(0, 3, 1, 2, 4).reshape(b, h, h, 3)
    rgb = rgb * mask          # the commuted mask multiply
    np.testing.assert_allclose(rgb, ref, atol=1e-5)


def test_synthesis_cl_packed_last_level_cpu_fallback(rng=None):
    """On CPU (no Mosaic) the packed-last-level branch must NOT activate
    (v2_eligible false for f32) and synthesis_cl stays consistent between
    optimistic and fixup programs."""
    import jax.numpy as jnp
    from float_tpu.models.init import init_synthesis, init_encoder
    from float_tpu.models.encoder import encode_image
    from float_tpu.models.synthesis import synthesis_cl
    rng = np.random.default_rng(5)

    enc = init_encoder(64, 32, 20, seed=1)
    dec = init_synthesis(64, 32, 20, seed=2)
    x = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    h, _, feats = encode_image(enc, x, 64, 32)
    wa = h + jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32) * 0.1)
    feats_cl = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]

    ref, _ = synthesis_cl(dec, wa, feats_cl, 64)
    img, _, stats, flags = synthesis_cl(dec, wa, feats_cl, 64,
                                        collect_flow_stats=True,
                                        apply_fixup=False)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)
    assert flags.shape == (0,)          # no kernel levels at 64²
