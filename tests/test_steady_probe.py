"""Steady-state probe skip (runtime/decode.py _STEADY machinery).

The flow_needed_disp probe is advisory — the monotone D ratchet and the
trace-time path choice — while correctness comes from the kernels'
overflow flags + fixup re-decode.  After _STEADY_K quiet clips the
optimistic dispatch drops the probe fusions (probe=False, measured +5.4%
e2e on chip: experiments/probe_lane_bench.py); any flag-fire re-decodes
exactly, bumps the flagged level, and resumes probing.

Reference behavior preserved: the decode stays exact for arbitrary flows
(the reference warps with F.grid_sample unconditionally,
/root/reference/src/nodes/models/float/styledecoder.py:399-425).
"""
import jax.numpy as jnp
import numpy as np

from float_tpu.runtime import decode as D


def _tiny_128():
    from float_tpu.models.init import init_synthesis, init_encoder
    from float_tpu.models.encoder import encode_image
    rng = np.random.default_rng(7)
    enc = init_encoder(128, 32, 20, seed=1)
    dec = init_synthesis(128, 32, 20, seed=2)
    x = jnp.asarray(rng.standard_normal((1, 3, 128, 128)).astype(np.float32))
    h, _, feats = encode_image(enc, x, 128, 32)
    wa = h + jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32)
                         * 0.1)
    feats_cl = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]
    return dec, wa, feats_cl


def test_probe_false_identical_output_zero_stats():
    """probe=False removes only the advisory stats: image and flags are
    unchanged, the stats vector keeps its shape but reads zero."""
    from float_tpu.models.synthesis import synthesis_cl
    dec, wa, feats_cl = _tiny_128()
    img_p, _, st_p, fl_p = synthesis_cl(
        dec, wa, feats_cl, 128, collect_flow_stats=True, apply_fixup=False,
        use_warp_kernel=False)
    img_n, _, st_n, fl_n = synthesis_cl(
        dec, wa, feats_cl, 128, collect_flow_stats=True, apply_fixup=False,
        use_warp_kernel=False, probe=False)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_n))
    np.testing.assert_array_equal(np.asarray(fl_p), np.asarray(fl_n))
    assert st_p.shape == st_n.shape
    assert (np.asarray(st_n) == 0).all()
    assert (np.asarray(st_p) >= 0).all()


def test_steady_engages_after_quiet_clips_and_resets_on_overflow():
    """Dispatch drops the probe after _STEADY_K quiet clips; an overflow
    flag in probe-free mode still re-decodes exactly (fixup program) and
    sends the decode back to probing."""
    calls = []          # (fixup, probe) per chunk_fn invocation
    state = {"ovf": 0}

    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True, probe=True):
        calls.append((fixup, probe))
        img = jnp.full((wa_c.shape[0], 4, 4, 3),
                       0.0 if fixup else 1.0, jnp.float32)
        stats = jnp.asarray([2] if probe else [0])
        flags = jnp.asarray([state["ovf"], 2])
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    size = 4
    for d in (D._DISP_RATCHET, D._PATH_RATCHET, D._PESSIMIST,
              D._PESSIMIST_FIT, D._STEADY):
        d.pop(size, None)
    r_d = jnp.zeros((8, 1))

    def run():
        return D.decode_latents({}, jnp.zeros((1, 1)), [], r_d, size=size,
                                decode_batch=8, chunk_fn=fake_fn)

    run()
    run()
    assert [c for c in calls] == [(False, True), (False, True)]
    assert D._STEADY[size] == D._STEADY_K

    run()                                   # steady: probe-free program
    assert calls[2] == (False, False)

    state["ovf"] = 1                        # regime change mid-steady
    frames = run()
    assert calls[3] == (False, False)       # optimistic dispatch...
    assert calls[4] == (True, True)         # ...then exact fixup redo
    # the re-decoded chunk's frames come from the fixup program
    assert float(np.asarray(frames)[0, 0, 0, 0]) == 0.0
    assert D._STEADY[size] == 0             # counter reset

    state["ovf"] = 0
    run()
    assert calls[5] == (False, True)        # probing resumed


def test_steady_never_engages_for_gather_decode():
    """use_warp_kernel=False has no kernel flags (no overflow safety
    net): the probe must stay on no matter how quiet the clips are."""
    calls = []

    def fake_fn(params, wa_c, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True, probe=True):
        calls.append(probe)
        img = jnp.zeros((wa_c.shape[0], 4, 4, 3), jnp.float32)
        stats = jnp.asarray([2])
        flags = jnp.zeros((0,), jnp.int32)  # gather mode: no flags
        if with_stats and not fixup:
            return img, stats, flags
        return (img, stats) if with_stats else img

    size = 4
    for d in (D._DISP_RATCHET, D._PATH_RATCHET, D._PESSIMIST, D._STEADY):
        d.pop(size, None)
    r_d = jnp.zeros((8, 1))
    for _ in range(4):
        D.decode_latents({}, jnp.zeros((1, 1)), [], r_d, size=size,
                         decode_batch=8, chunk_fn=fake_fn,
                         use_warp_kernel=False)
    assert all(calls)                       # every dispatch probed
    assert D._STEADY.get(size, 0) == 0
