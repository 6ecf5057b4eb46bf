"""Frame-batched streaming decode — the throughput-critical stage.

The reference decodes frame-by-frame with B=1 and a per-frame GPU->CPU copy
(reference: src/nodes/models/float/FLOAT.py:113-169).  TPU-native design:

- frames are decoded in batches of ``decode_batch`` so every modulated conv
  is one large MXU op,
- ONE jitted chunk program is reused across the whole clip (python-level
  chunk loop: dispatch overhead is micro-seconds per ~milliseconds of
  compute, and the decoded chunks stream out as they finish — the
  long-video memory behavior the reference's streamed decode targets),
- the [0,1] conversion and HWC permute happen on device; frames are
  device-side concatenated and transferred once by the caller.

(A ``lax.scan`` formulation was measured to explode XLA:CPU compile time on
the synthesis body; the chunked-jit design compiles once and behaves
identically on TPU.)
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.synthesis import synthesis

import logging

logger = logging.getLogger("float_tpu.decode")


def _chunk_core(params, wa_chunk, feats, size, out_u8=False,
                channels_last=True, blur_kernel=(1, 3, 3, 1),
                warp_disp=2, with_stats=False, fixup=True,
                warp_path="auto", use_warp_kernel=True, probe=True):
    """(fb, dim_w) latents -> (fb, S, S, 3) frames in [0,1] f32 or uint8.

    channels_last runs the NHWC synthesis path (feats must be NHWC): the
    warp kernels get their native layout with no transposes, and the
    output is already HWC.  Set False for the NCHW reference path.

    ``out_u8`` is a 3-way static: False = float32 [0,1]; True = uint8 RGB
    (4x less wire than f32); "yuv420" = planar 4:2:0 uint8
    (fb, S*3//2, S) — HALF the uint8-RGB wire bytes, for delivery paths
    whose final encoding subsamples chroma anyway (ops/yuv420.py).

    ``warp_disp`` is the static tap bound D of the shift-warp kernels;
    ``with_stats=True`` additionally returns the per-level needed
    displacements (the adaptive-D ratchet probe).

    ``fixup=False`` is the OPTIMISTIC program (requires with_stats): the
    warp kernels skip their beyond-D fixup conds (a never-taken cond
    still pays XLA conditional-boundary copies, ~5 ms/chunk at 512²) and
    the return gains per-level overflow flags: (img, stats, flags).  Any
    flag > 0 means the chunk is INVALID beyond-D and must be re-decoded
    with fixup=True — decode_latents does this after its single
    post-loop stats sync.

    ``use_warp_kernel=False`` routes every warp through the exact XLA
    gather instead of the Pallas kernels — the only decode mode that
    runs on non-TPU backends (pallas_call cannot lower on XLA:CPU), used
    by the readiness gate's off-chip flow probe.  The D ratchet still
    learns (flow_needed_disp is kernel-independent); the fast-path
    spread stats are kernel-only and stay untouched.
    """
    assert fixup or with_stats, \
        "the optimistic (fixup=False) program reports overflow flags via " \
        "the stats return; call it with with_stats=True"
    stats = jnp.zeros((0,), jnp.int32)   # no kernel levels -> no probe
    flags = jnp.zeros((0,), jnp.int32)
    if channels_last:
        from ..models.synthesis import synthesis_cl
        if with_stats and not fixup:
            img, _, stats, flags = synthesis_cl(
                params, wa_chunk, feats, size, blur_kernel=blur_kernel,
                warp_disp=warp_disp, collect_flow_stats=True,
                apply_fixup=False, warp_path=warp_path,
                use_warp_kernel=use_warp_kernel, probe=probe)
        elif with_stats:
            img, _, stats = synthesis_cl(params, wa_chunk, feats, size,
                                         blur_kernel=blur_kernel,
                                         warp_disp=warp_disp,
                                         collect_flow_stats=True,
                                         use_warp_kernel=use_warp_kernel,
                                         probe=probe)
        else:
            img, _ = synthesis_cl(params, wa_chunk, feats, size,
                                  blur_kernel=blur_kernel,
                                  warp_disp=warp_disp,
                                  use_warp_kernel=use_warp_kernel)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        img = (img + 1.0) * 0.5
    else:
        img, _ = synthesis(params, wa_chunk, feats, size,
                           blur_kernel=blur_kernel)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        img = (img + 1.0) * 0.5
        img = jnp.transpose(img, (0, 2, 3, 1))
    if out_u8 == "yuv420":
        from ..ops.yuv420 import rgb01_to_i420
        img = rgb01_to_i420(img)
    elif out_u8:
        img = jnp.round(img * 255.0).astype(jnp.uint8)
    if with_stats and not fixup:
        return img, stats, flags
    return (img, stats) if with_stats else img


_decode_chunk = partial(jax.jit, static_argnames=(
    "size", "out_u8", "channels_last", "blur_kernel", "warp_disp",
    "with_stats", "fixup", "warp_path", "use_warp_kernel",
    "probe"))(_chunk_core)


def make_sharded_chunk_fn(mesh):
    """Frame-parallel decode chunk over a device mesh.

    shard_map (not GSPMD annotations) so the Pallas warp kernels run
    per-device on their local frame shard — every frame is independent
    (SURVEY §5.7), the only collective is the pmax on the probe stats.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)

    @partial(jax.jit, static_argnames=("size", "out_u8", "channels_last",
                                       "blur_kernel", "warp_disp",
                                       "with_stats", "fixup", "warp_path",
                                       "use_warp_kernel", "probe"))
    def chunk_fn(params, wa_chunk, feats, size, out_u8=False,
                 channels_last=True, blur_kernel=(1, 3, 3, 1),
                 warp_disp=DEFAULT_WARP_DISP, with_stats=False, fixup=True,
                 warp_path="auto", use_warp_kernel=True, probe=True):
        assert wa_chunk.shape[0] % mesh.size == 0, (
            f"decode_batch {wa_chunk.shape[0]} not divisible by mesh size "
            f"{mesh.size}")

        def _allmax(v):
            if v.shape[0]:
                for ax in axes:
                    v = jax.lax.pmax(v, ax)
            return v

        def body(p, w, f):
            out = _chunk_core(p, w, f, size, out_u8=out_u8,
                              channels_last=channels_last,
                              blur_kernel=blur_kernel, warp_disp=warp_disp,
                              with_stats=with_stats, fixup=fixup,
                              warp_path=warp_path,
                              use_warp_kernel=use_warp_kernel, probe=probe)
            if with_stats and not fixup:
                img, stats, flags = out
                return img, _allmax(stats), _allmax(flags)
            if with_stats:
                img, stats = out
                return img, _allmax(stats)
            return out

        if with_stats and not fixup:
            out_specs = (P(axes), P(), P())
        elif with_stats:
            out_specs = (P(axes), P())
        else:
            out_specs = P(axes)
        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(axes), P()),
            out_specs=out_specs,
        )(params, wa_chunk, feats)

    return chunk_fn


DEFAULT_WARP_DISP = 2
MAX_WARP_DISP = 7        # the kernels' halo margin bound (coarsest level)


def _disp_caps(size: int) -> tuple:
    """Per-kernel-level ratchet caps, COMPILE-PROVEN on v5e
    (experiments/warp_d_feasibility.py): the packed kernel's scoped-vmem
    stack grows with D and with lane groups (128/C), so at 24-frame
    chunks the finest level (C=32, 4 groups) caps at D=3 — D=4 already
    exceeds the 30 MB scoped-vmem limit at COMPILE time — while 256²
    (C=64) tolerates 6 and 128² (C=128) the full 7.  Flows beyond the
    cap stay exact through the cond-gather fixup re-decode; without the
    cap the ratchet could request an uncompilable kernel and crash the
    clip (observed on 60 s synthetic-flow clips)."""
    from ..config import CHANNELS_MAP
    from ..models.synthesis import n_kernel_levels
    caps = []
    for i in range(n_kernel_levels(size)):
        c = CHANNELS_MAP.get(1 << (i + 7), 32)   # index 0 -> 128², ...
        caps.append(7 if c >= 128 else 6 if c >= 64 else 3 if c >= 32
                    else DEFAULT_WARP_DISP)
    return tuple(caps)

# Monotone per-process ratchet of per-level warp D, keyed by image size.
# The first decode chunk of every clip doubles as a flow probe; the
# ratchet only grows, so the static-D chunk programs recompile at most
# (MAX-2)·levels times per process and are then stable.  Exactness never
# depends on the ratchet — flows beyond D hit the cond-gather fixup.
_DISP_RATCHET: dict = {}

# Sticky "optimism lost" switch: when a level keeps overflowing while its
# D ratchet is PINNED at the compile-proven cap (_disp_caps), the
# optimistic dispatch re-decodes (and on host paths re-transfers) most
# chunks every clip — double work forever.  The next clips then dispatch
# the always-exact fixup program as PRIMARY (single decode, single
# transfer); the probe stats keep ratcheting, and when a clip's flows fit
# the current D again the switch clears and optimism resumes.  Chaotic
# synthetic-checkpoint flows live here; real trained flows should never
# trip it (PERF.md r4 serving note).
_PESSIMIST: dict = {}        # size -> True
_PESSIMIST_FIT: dict = {}    # size -> consecutive clips whose flows fit
# non-strict fits (m <= D on every level) needed to clear the switch: one
# clip's probe samples a 4-frame subset per chunk, so a single stat equal
# to D may just mean the subset under-observed a clip that still
# overflows (exactly the situation that set the switch) — but when a
# clip's needed D settles EXACTLY at a level's cap or the floor 2, a
# strict fit can never happen and strict-only clearing would pin
# fixup-primary dispatch forever (ADVICE r4).  K consecutive fitting
# clips bound that false-positive risk instead.
_PESSIMIST_CLEAR_K = 3

# Steady-state probe skip: the flow_needed_disp stats are ADVISORY (the
# monotone D ratchet + trace-time path choice), while correctness and
# regime-change detection come from the kernels' in-SMEM overflow/spread
# flags.  After _STEADY_K consecutive quiet clips (no overflow redo, no
# ratchet growth, no path change, no pessimist flip) the optimistic
# dispatch drops the probe fusions from the chunk program (probe=False):
# measured +5.4% e2e at 512² (experiments/probe_lane_bench.py, ~3 ms of
# a ~55 ms chunk).  Any flag-fire in probe-free mode bumps the flagged
# level's D by 1 (_sync_stats_flags' subset-miss path), re-decodes the
# chunk exactly, and resets the counter so probing resumes.
_STEADY: dict = {}           # size -> consecutive quiet clips
_STEADY_K = 2


def _steady_get(size: int) -> bool:
    return _STEADY.get(size, 0) >= _STEADY_K


def _pessimist_get(size: int) -> bool:
    return _PESSIMIST.get(size, False)


def _pessimist_fold(size: int, all_stats: list) -> None:
    """Post-loop fold for fixup-primary clips: keep ratcheting the probe
    stats, and clear the pessimist switch when observed flows fit the
    (possibly grown) ratchet — immediately on a strict fit (m < D on all
    levels), or after _PESSIMIST_CLEAR_K consecutive non-strict fits
    (m <= D; covers regimes whose needed D sits exactly at a cap)."""
    import numpy as np
    stats = [s for s in all_stats if s is not None and s.shape[0]]
    if not stats:
        return
    m = np.asarray(jnp.stack(stats)).max(axis=0)
    _ratchet_apply(size, m)
    cur = np.asarray(_ratchet_get(size))
    if m.size != len(cur) or not len(cur):
        return
    if (m < cur).all():
        fits = _PESSIMIST_CLEAR_K
    elif (m <= cur).all():
        fits = _PESSIMIST_FIT.get(size, 0) + 1
    else:
        fits = 0
    if fits >= _PESSIMIST_CLEAR_K:
        _PESSIMIST.pop(size, None)
        _PESSIMIST_FIT.pop(size, None)
        logger.info("flows fit D=%s again: resuming optimistic decode "
                    "at %d²", tuple(cur), size)
    else:
        _PESSIMIST_FIT[size] = fits


def _ratchet_get(size: int) -> tuple:
    from ..models.synthesis import n_kernel_levels
    n = n_kernel_levels(size)
    return _DISP_RATCHET.get(size, (DEFAULT_WARP_DISP,) * n)


def seed_ratchet(size: int, disp) -> tuple:
    """Pre-seed the per-level warp D (e.g. from a persisted flow profile)
    so the first clip of a process already runs the converged programs
    instead of learning D through flagged chunks + re-decodes."""
    from ..models.synthesis import n_kernel_levels
    n = n_kernel_levels(size)
    caps = _disp_caps(size)
    disp = tuple(int(min(max(int(d), DEFAULT_WARP_DISP), cap))
                 for d, cap in zip(disp, caps))
    if len(disp) != n:
        raise ValueError(f"profile has {len(disp)} levels, size {size} "
                         f"needs {n}")
    cur = _ratchet_get(size)
    _DISP_RATCHET[size] = tuple(max(d, c) for d, c in zip(disp, cur))
    return _DISP_RATCHET[size]


def save_warp_profile(path: str, checkpoint: str = "") -> dict:
    """Persist the process's learned per-level warp D (the flow profile
    the readiness gate writes; tools/readiness_check.py)."""
    import json
    prof = {
        "version": 1,
        "checkpoint": checkpoint,
        "disp": {str(size): list(d) for size, d in _DISP_RATCHET.items()},
        "path": {str(size): list(p) for size, p in _PATH_RATCHET.items()},
    }
    with open(path, "w") as f:
        json.dump(prof, f, indent=1)
    return prof


def load_warp_profile(path: str) -> dict:
    """Seed the ratchet from a persisted flow profile; returns the dict.
    Missing file is a no-op (the ratchet then learns per process)."""
    import json
    import os
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        prof = json.load(f)
    for size, disp in prof.get("disp", {}).items():
        seed_ratchet(int(size), disp)
    for size, paths in prof.get("path", {}).items():
        seed_paths(int(size), paths)
    logger.info("seeded warp ratchets from %s: D=%s path=%s", path,
                prof.get("disp"), prof.get("path"))
    return prof


def _ratchet_apply(size: int, stats) -> tuple:
    """Fold probe stats into the ratchet (D floor 2: below it the
    align_corners=False half-pixel offset leaves no slack and the fixup
    fires; per-level caps = compile-proven kernel bounds, _disp_caps)."""
    import numpy as np
    s = np.asarray(stats)
    cur = _ratchet_get(size)
    if s.size != len(cur):
        return cur
    caps = _disp_caps(size)
    new = tuple(int(min(max(int(v), c), cap))
                for v, c, cap in zip(s, cur, caps))
    if new != cur:
        _DISP_RATCHET[size] = new
    return new


def _ratchet_apply_max(size: int, all_stats: list) -> tuple:
    """Fold per-chunk stats vectors into the ratchet with ONE device sync
    (stack on device, transfer once)."""
    import numpy as np
    stats = [s for s in all_stats if s is not None and s.shape[0]]
    if not stats:
        return _ratchet_get(size)
    return _ratchet_apply(size, np.asarray(jnp.stack(stats)).max(axis=0))


# ---------------------------------------------------------------------------
# trace-time warp fast-path ratchet
# ---------------------------------------------------------------------------
#
# The v2 kernel's per-tile lax.cond chain (fast4 / fast6 / slow) is exact
# for any flow within D, but the cond mix is what makes chunk times vary
# 48-75 ms (PERF.md) — and a cond-free program is faster even when the
# cond always takes the same branch.  Every optimistic chunk reports the
# per-level MAX LOCAL SPREAD (flags[2*l+1], computed in-kernel from the
# same min/max fields the recentering already needs); after the first
# clip the ratchet selects per level the smallest cond-free path that
# covers the observed spread (fast4: spread <= 2, fast6: <= 4, else
# auto), and demotes a level when a later clip exceeds its capacity
# (the flagged chunks re-decode with the auto program — same safety
# pattern as the D ratchet).

_PATH_CAPACITY = {"fast3": 1, "fast4": 2, "fast5": 3, "fast6": 4,
                  "auto": 1 << 30}
_PATH_RATCHET: dict = {}       # size -> tuple[str] per kernel level


def _path_get(size: int) -> tuple:
    from ..models.synthesis import n_kernel_levels
    return _PATH_RATCHET.get(size, ("auto",) * n_kernel_levels(size))


def _path_for_spread(sp: int) -> str:
    if sp <= 1:
        # real-checkpoint flows may be smoother than the synthetic probe
        # flows (which sit at spread 2 at 512²); 9 taps vs fast4's 16
        return "fast3"
    if sp <= 2:
        return "fast4"
    if sp <= 3:
        return "fast5"
    if sp <= 4:
        return "fast6"
    return "auto"


def _path_fold(size: int, spread_max) -> tuple:
    """Fold observed per-level spreads into the path selection.

    First observation selects the smallest covering path; afterwards only
    demotions happen (no flapping between programs).  spread < 0 means
    'no statistic' (auto-only non-v2 level, or a gather-mode decode with
    use_warp_kernel=False) and keeps auto.  An ALL-negative vector
    carries zero information and must not create an entry: a first
    observation of ('auto', ...) would be demotion-locked and — once
    persisted by save_warp_profile and re-seeded — would permanently
    disable fast-path selection on the chip.

    A spread vector whose length does not match the size's kernel-level
    count is ignored (mirrors _ratchet_apply's mismatched-probe guard):
    recording it would poison the save_warp_profile → load_warp_profile
    roundtrip, whose seed_paths validates lengths."""
    from ..models.synthesis import n_kernel_levels
    cur = _PATH_RATCHET.get(size)
    n = len(spread_max)
    if n != n_kernel_levels(size):
        return cur if cur is not None else ("auto",) * n_kernel_levels(size)
    if cur is None and all(int(sp) < 0 for sp in spread_max):
        return ("auto",) * n
    if cur is None:
        new = tuple("auto" if sp < 0 else _path_for_spread(int(sp))
                    for sp in spread_max)
    else:
        new = tuple(c if sp < 0 or int(sp) <= _PATH_CAPACITY[c]
                    else _path_for_spread(int(sp))
                    for c, sp in zip(cur, spread_max))
    if cur is None or new != cur:
        _PATH_RATCHET[size] = new
        logger.info("warp path ratchet %d²: %s (spread %s)", size, new,
                    list(map(int, spread_max)))
    return new


def seed_paths(size: int, paths) -> tuple:
    """Pre-seed the per-level fast-path selection (from a warp profile).

    Merges toward the SAFER (higher-capacity) path like seed_ratchet's
    max-merge: a profile must never un-demote a level the running process
    already demoted from observed spread misses — that would re-introduce
    the miss/re-decode flapping the ratchet's monotonicity prevents."""
    from ..models.synthesis import n_kernel_levels
    n = n_kernel_levels(size)
    paths = tuple(str(p) for p in paths)
    if len(paths) != n or any(p not in _PATH_CAPACITY for p in paths):
        raise ValueError(f"bad path profile {paths} for size {size}")
    if all(p == "auto" for p in paths):
        # zero-information profile (e.g. written by a gather-mode/off-chip
        # probe): seeding it would pin 'auto' via the demotion-only rule
        # and permanently block fast-path selection — skip
        return _PATH_RATCHET.get(size, paths)
    cur = _PATH_RATCHET.get(size)
    if cur is not None:
        paths = tuple(p if _PATH_CAPACITY[p] >= _PATH_CAPACITY[c] else c
                      for p, c in zip(paths, cur))
    _PATH_RATCHET[size] = paths
    return paths


def _sync_stats_flags(size: int, all_stats: list, all_flags: list,
                      paths: tuple = None) -> list:
    """One post-loop device sync: ratchet the stats, select/demote the
    fast paths, and return the indices of chunks that must re-decode with
    the auto+fixup program — beyond-D overflows (flags[2l] > 0) and
    fast-path spread misses (flags[2l+1] > capacity of the path the chunk
    was DISPATCHED with, ``paths``)."""
    import numpy as np
    if not all_flags or all_flags[0].shape[0] == 0:
        # exact-gather decode (no kernel flags): no overflow safety net,
        # so the steady probe-skip never engages here (see dispatch)
        _ratchet_apply_max(size, all_stats)
        return []
    before = (_ratchet_get(size), _path_get(size), _pessimist_get(size))
    packed = jnp.concatenate(
        [jnp.stack(all_stats), jnp.stack(all_flags)], axis=1)
    host = np.asarray(packed)                       # single transfer
    n_lv = all_stats[0].shape[0]
    stats_max = host[:, :n_lv].max(axis=0)
    fl = host[:, n_lv:].reshape(host.shape[0], -1, 2)
    ovf = fl[:, :, 0]                               # (n_chunks, n_lv)
    spread = fl[:, :, 1]
    ovf_any = ovf.any(axis=0)
    # The probe samples a 4-frame subset per chunk: when a level's overflow
    # flag fires but the subset stat never exceeded the current D, the big
    # flow lives only in unsampled frames — without a bump the ratchet
    # would never grow and every clip would permanently pay the double
    # decode for flagged chunks.  Bump such levels by 1 so the optimistic
    # program converges to the clip regime.
    cur = np.asarray(_ratchet_get(size))
    if ovf_any.shape[0] == n_lv:
        stats_max = np.where(ovf_any & (stats_max <= cur),
                             cur + 1, stats_max)
    _ratchet_apply(size, stats_max)

    # optimism lost: a level overflowing on most chunks while PINNED at
    # its compile cap will redo (and re-transfer) every clip — switch the
    # next clips to fixup-primary dispatch (_PESSIMIST; cleared by
    # _pessimist_fold when flows fit again)
    caps = np.asarray(_disp_caps(size))
    if ovf_any.shape[0] == len(caps) and len(caps):
        frac = ovf.mean(axis=0)                      # per level
        if bool(((frac > 0.5) & (cur >= caps)).any()):
            if not _PESSIMIST.get(size):
                logger.info("optimistic decode losing at %d² (overflow on "
                            "%s of chunks at the D cap): switching to "
                            "fixup-primary dispatch", size,
                            np.round(frac, 2).tolist())
            _PESSIMIST[size] = True
            _PESSIMIST_FIT.pop(size, None)   # fit streak starts fresh

    redo = ovf.any(axis=1)
    if spread.shape[1] == n_lv:
        if paths is not None:
            cap = np.asarray([_PATH_CAPACITY[p] for p in paths])
            redo |= (spread > cap[None, :]).any(axis=1)
        _path_fold(size, spread.max(axis=0))
    redo_idx = [int(ci) for ci in np.nonzero(redo)[0]]
    # steady-state bookkeeping: a quiet clip (nothing re-decoded, no
    # ratchet/path/pessimist change) advances toward the probe-free
    # program; any activity resets it and probing resumes
    after = (_ratchet_get(size), _path_get(size), _pessimist_get(size))
    if not redo_idx and after == before:
        _STEADY[size] = _STEADY.get(size, 0) + 1
    else:
        _STEADY[size] = 0
    return redo_idx


def _chunk_sizes(t_frames: int, fb: int, bucketed: bool) -> list:
    """Per-chunk frame counts.  With ``bucketed`` the LAST chunk shrinks
    to the smallest multiple of 4 covering the remainder (4 = the widest
    frame-lane packing group, 128/32 at 512²) instead of paying a full
    ``fb``-frame program on padding — e.g. 250 frames at fb=16 decode as
    15×16 + 1×12 (244) instead of 16×16 (256).  Costs one extra chunk
    program compile per distinct remainder bucket (cached per process /
    AOT cache)."""
    n_chunks = math.ceil(t_frames / fb)
    sizes = [fb] * n_chunks
    if bucketed and n_chunks:
        rem = t_frames - (n_chunks - 1) * fb
        sizes[-1] = min(fb, max(4, math.ceil(rem / 4) * 4))
    return sizes


def _supports_probe(chunk_fn) -> bool:
    """Steady-state dispatch passes ``probe=False`` as an extra kwarg;
    a custom chunk_fn override that predates the param (or a test fake)
    must simply never get it — the probe skip is an optimization, not a
    contract."""
    if chunk_fn is None:
        return True
    import inspect
    try:
        sig = inspect.signature(chunk_fn)
    except (TypeError, ValueError):
        return False
    if "probe" in sig.parameters:
        return True
    return any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values())


def _supports_buckets(chunk_fn) -> bool:
    """Remainder-chunk bucketing needs a chunk fn that accepts any frame
    count: the default _decode_chunk does; an override only does if it
    says so (chunk_fn.supports_buckets — the AOT wrapper sets it; the
    shard_map mesh fn does NOT: its frame batch must stay divisible by
    the mesh, so mesh mode pads to full decode_batch chunks)."""
    return chunk_fn is None or getattr(chunk_fn, "supports_buckets", False)


def _cast_params(params, dtype):
    """Cast the synthesis pytree unless it already matches ``dtype``.

    The per-call tree.map was ~200 device dispatches per clip; callers that
    hold pre-cast params (FloatPipeline does) skip it entirely."""
    leaves = jax.tree.leaves(params)
    if all(getattr(l, "dtype", None) == dtype for l in leaves):
        return params
    return jax.tree.map(lambda a: a.astype(dtype), params)


def decode_latents(
    synthesis_params,
    s_r: jnp.ndarray,          # (1, dim_w) appearance latent
    feats: list,               # 7 skip maps, each (1, C, H, W)
    r_d: jnp.ndarray,          # (T, dim_w) motion latents
    *,
    size: int,
    decode_batch: int = 8,
    compute_dtype=jnp.float32,
    blur_kernel=(1, 3, 3, 1),
    chunk_fn=None,             # override: e.g. make_sharded_chunk_fn(mesh)
    frame_callback=None,       # optional fn(chunk_idx, n_chunks) progress hook
    use_warp_kernel: bool = True,   # False: exact-gather warps (off-chip)
) -> jnp.ndarray:
    """Decode T frames -> (T, size, size, 3) float32 in [0, 1].

    Assumes the reference's B=1 contract (FLOAT.py:119); frame batching
    replaces the reference's per-frame loop.
    """
    t_frames = r_d.shape[0]
    fb = decode_batch
    sizes = _chunk_sizes(t_frames, fb, bucketed=_supports_buckets(chunk_fn))
    n_chunks = len(sizes)
    t_pad = sum(sizes)

    dtype = jnp.dtype(compute_dtype)
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    if t_pad > t_frames:
        wa = jnp.pad(wa, ((0, t_pad - t_frames), (0, 0)), mode="edge")

    # NHWC path: transpose the 7 skip maps once per clip
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = _cast_params(synthesis_params, dtype)

    # OPTIMISTIC dispatch: every chunk runs the fixup-free program —
    # the warp kernels skip their beyond-D conds (a never-taken cond
    # still costs XLA conditional-boundary copies, ~5 ms/chunk) — and
    # reports per-level (overflow flags, displacement-bound stats).
    # Both fold in AFTER the dispatch loop with ONE device sync
    # (mid-loop polling costs a ~30 ms tunnel round trip per chunk):
    # flagged chunks are re-decoded with the fixup program (rare — the
    # monotone ratchet converges to the clip regime's true max D), and
    # the stats ratchet the next clip's D.
    chunks = []
    fn = chunk_fn or _decode_chunk
    disp = _ratchet_get(size)
    paths = _path_get(size)
    pess = _pessimist_get(size)     # fixup-primary when optimism lost
    # converged regime: drop the advisory flow-stats probe from the chunk
    # program (+5.4% e2e measured); kernel flags keep watching for regime
    # changes.  Passed as an extra kwarg only when engaged so custom
    # chunk_fn overrides without a ``probe`` param keep working.
    steady = (not pess) and use_warp_kernel and _steady_get(size) \
        and _supports_probe(chunk_fn)
    opt_kw = {"probe": False} if steady else {}
    all_stats = []
    all_flags = []
    for ci, sz in enumerate(sizes):
        wa_c = wa[ci * fb:ci * fb + sz]
        if pess:
            chunk, stats = fn(params_c, wa_c, feats_c, size=size,
                              blur_kernel=blur_kernel,
                              warp_disp=disp, with_stats=True,
                              use_warp_kernel=use_warp_kernel)
        else:
            chunk, stats, flags = fn(params_c, wa_c, feats_c, size=size,
                                     blur_kernel=blur_kernel,
                                     warp_disp=disp, with_stats=True,
                                     fixup=False, warp_path=paths,
                                     use_warp_kernel=use_warp_kernel,
                                     **opt_kw)
            all_flags.append(flags)
        chunks.append(chunk)
        all_stats.append(stats)
        if frame_callback is not None:
            frame_callback(ci, n_chunks)
    if pess:
        _pessimist_fold(size, all_stats)
        redo = []
    else:
        redo = _sync_stats_flags(size, all_stats, all_flags, paths)
    if redo:
        # rare: flows exceeded the ratcheted D this clip (the ratchet just
        # grew for the next one).  First occurrence per process compiles
        # the fixup chunk program — a one-time stall on this transport.
        logger.info("re-decoding %d/%d chunks with the beyond-D fixup "
                    "program", len(redo), n_chunks)
    for ci in redo:
        chunks[ci], _ = fn(params_c, wa[ci * fb:ci * fb + sizes[ci]],
                           feats_c,
                           size=size, blur_kernel=blur_kernel,
                           warp_disp=disp, with_stats=True,
                           use_warp_kernel=use_warp_kernel)
    frames = jnp.concatenate(chunks, axis=0)
    return frames[:t_frames]


def decode_latents_to_host(
    synthesis_params, s_r, feats, r_d, *,
    size: int, decode_batch: int = 8, compute_dtype=jnp.float32,
    blur_kernel=(1, 3, 3, 1), uint8_transfer: bool = True,
    chunk_fn=None, frame_callback=None, use_warp_kernel: bool = True,
):
    """Decode + stream frames to HOST memory chunk by chunk.

    Long clips must not round-trip as one giant float32 device array
    (a 60 s clip is 4.7 GB; the reference hit the same wall and streams
    per frame, FLOAT.py:113-169).  Frames are converted to uint8 ON DEVICE
    (4x less transfer; videos are 8-bit anyway) and each chunk's transfer
    overlaps the next chunk's compute.  Returns (T, S, S, 3) float32 [0,1].
    """
    import numpy as np
    t_frames = r_d.shape[0]
    fb = decode_batch
    sizes = _chunk_sizes(t_frames, fb, bucketed=_supports_buckets(chunk_fn))
    n_chunks = len(sizes)
    t_pad = sum(sizes)

    dtype = jnp.dtype(compute_dtype)
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    if t_pad > t_frames:
        wa = jnp.pad(wa, ((0, t_pad - t_frames), (0, 0)), mode="edge")
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = _cast_params(synthesis_params, dtype)

    out = np.empty((t_frames, size, size, 3), np.float32)
    pending = []
    fn = chunk_fn or _decode_chunk
    disp = _ratchet_get(size)
    paths = _path_get(size)
    pess = _pessimist_get(size)     # fixup-primary when optimism lost:
    all_stats = []                  # no redo means no RE-TRANSFER either
    all_flags = []
    steady = (not pess) and use_warp_kernel and _steady_get(size) \
        and _supports_probe(chunk_fn)
    opt_kw = {"probe": False} if steady else {}   # see decode_latents
    for ci, sz in enumerate(sizes):
        wa_c = wa[ci * fb:ci * fb + sz]
        # optimistic fixup-free program; flags + stats folded post-loop
        # in one sync (see decode_latents)
        if pess:
            dev, stats = fn(params_c, wa_c, feats_c, size=size,
                            out_u8=uint8_transfer,
                            blur_kernel=blur_kernel,
                            warp_disp=disp, with_stats=True,
                            use_warp_kernel=use_warp_kernel)
        else:
            dev, stats, flags = fn(params_c, wa_c, feats_c, size=size,
                                   out_u8=uint8_transfer,
                                   blur_kernel=blur_kernel,
                                   warp_disp=disp, with_stats=True,
                                   fixup=False, warp_path=paths,
                                   use_warp_kernel=use_warp_kernel,
                                   **opt_kw)
            all_flags.append(flags)
        pending.append((ci, dev))
        all_stats.append(stats)
        # keep one chunk in flight: materialize the previous one while the
        # current computes
        if len(pending) > 1:
            done = pending.pop(0)
            _drain(done, out, fb, t_frames, uint8_transfer)
            # the drain blocks until the chunk's bytes arrived, so the
            # callback reflects REAL completion (a dispatch-time callback
            # would jump to 100% while the device still works)
            if frame_callback is not None:
                frame_callback(done[0], n_chunks)
    for item in pending:
        _drain(item, out, fb, t_frames, uint8_transfer)
        if frame_callback is not None:
            frame_callback(item[0], n_chunks)
    if pess:
        _pessimist_fold(size, all_stats)
        return out
    # overflowed chunks: re-decode with the fixup program and re-drain
    redo = _sync_stats_flags(size, all_stats, all_flags, paths)
    if redo:
        logger.info("re-decoding %d/%d chunks with the beyond-D fixup "
                    "program", len(redo), n_chunks)
    for ci in redo:
        dev, _ = fn(params_c, wa[ci * fb:ci * fb + sizes[ci]], feats_c,
                    size=size,
                    out_u8=uint8_transfer, blur_kernel=blur_kernel,
                    warp_disp=disp, with_stats=True,
                    use_warp_kernel=use_warp_kernel)
        _drain((ci, dev), out, fb, t_frames, uint8_transfer)
    return out


def _drain(item, out, fb, t_frames, uint8_transfer):
    import numpy as np
    ci, dev = item
    host = np.asarray(dev)
    if uint8_transfer:
        host = host.astype(np.float32) / 255.0
    lo = ci * fb
    hi = min(lo + fb, t_frames)
    out[lo:hi] = host[: hi - lo]


def decode_latents_stream(
    synthesis_params, s_r, feats, latent_iter, *,
    size: int, decode_batch: int = 8, compute_dtype=jnp.float32,
    blur_kernel=(1, 3, 3, 1), uint8_transfer: bool = True,
    chunk_fn=None, frame_callback=None, use_warp_kernel: bool = True,
    first_chunk: int = 0, emit: str = "f32",
):
    """Incremental decode: consume (k, dim_w) r_d pieces from
    ``latent_iter`` and yield (start_frame, frames (k', S, S, 3) float32
    [0,1]) as soon as each decode chunk's bytes reach the host.

    ``emit`` selects what the generator yields (and the matching wire):
    "f32" (default) — float32 [0,1] RGB, uint8 on the wire when
    ``uint8_transfer``; "u8" — uint8 RGB as transferred (no host /255
    round-trip; serving re-quantizes anyway); "yuv420" — planar 4:2:0
    uint8 (k', S*3//2, S), HALF the u8 wire bytes (ops/yuv420.py), for
    JPEG/video delivery whose encoder subsamples chroma regardless.

    The streaming-latency mode (VERDICT r2 #3): the sampler generator can
    keep integrating chunk c+1 while chunk c decodes — dispatches are
    async, the device executes in order, and the host only blocks on the
    chunk it is about to yield (one chunk stays in flight).

    ``first_chunk`` > 0 ramps the FIRST dispatch at a smaller frame count
    (rounded to the 4-frame lane-packing bucket) so the first frames
    reach the client after a fraction of a full chunk's compute + wire —
    throughput is unaffected (all later chunks are full ``decode_batch``)
    and the small-bucket program is shared with the tail-remainder
    buckets (_chunk_sizes).

    Uses the always-exact fixup chunk program: frames leave the function
    before the optimistic path's post-loop flag sync could validate them,
    so optimism is not sound here (it would yield invalid frames).  The
    probe stats still feed the ratchet at generator close.
    """
    import numpy as np

    if emit not in ("f32", "u8", "yuv420"):
        raise ValueError(f"unknown emit format {emit!r}")
    out_u8 = "yuv420" if emit == "yuv420" else (uint8_transfer
                                                or emit == "u8")
    fb = decode_batch
    if first_chunk:
        first_chunk = min(fb, max(4, math.ceil(first_chunk / 4) * 4))
    dtype = jnp.dtype(compute_dtype)
    s32 = s_r.astype(jnp.float32)
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = _cast_params(synthesis_params, dtype)
    fn = chunk_fn or _decode_chunk
    disp = _ratchet_get(size)

    buf: list = []                 # pending latent rows (device arrays)
    buffered = 0
    pending = None                 # (start_frame, n_valid, dev_chunk)
    all_stats = []
    n_done = 0

    def _dispatch(rows, start, n_valid):
        wa_c = (s32 + rows.astype(jnp.float32)).astype(dtype)
        dev, stats = fn(params_c, wa_c, feats_c, size=size,
                        out_u8=out_u8, blur_kernel=blur_kernel,
                        warp_disp=disp, with_stats=True,
                        use_warp_kernel=use_warp_kernel)
        all_stats.append(stats)
        return (start, n_valid, dev)

    def _emit(item):
        nonlocal n_done
        start, n_valid, dev = item
        host = np.asarray(dev)[:n_valid]
        if emit == "f32" and uint8_transfer:
            host = host.astype(np.float32) / 255.0
        n_done += 1
        if frame_callback is not None:
            frame_callback(n_done - 1, -1)   # total unknown mid-stream
        return start, host

    emitted_rows = 0
    want = first_chunk or fb          # ramp size for dispatch 0 only
    for piece in latent_iter:
        buf.append(piece)
        buffered += piece.shape[0]
        while buffered >= want:
            cat = buf[0] if len(buf) == 1 else jnp.concatenate(buf, axis=0)
            rows, rest = cat[:want], cat[want:]
            buf = [rest] if rest.shape[0] else []
            buffered = rest.shape[0]
            item = _dispatch(rows, emitted_rows, want)
            emitted_rows += want
            want = fb
            if pending is not None:
                yield _emit(pending)
            pending = item
    if buffered:
        cat = buf[0] if len(buf) == 1 else jnp.concatenate(buf, axis=0)
        pad = jnp.broadcast_to(cat[-1:], (want - buffered, cat.shape[1]))
        item = _dispatch(jnp.concatenate([cat, pad], axis=0),
                         emitted_rows, buffered)
        if pending is not None:
            yield _emit(pending)
        pending = item
    if pending is not None:
        yield _emit(pending)
    _ratchet_apply_max(size, all_stats)


def decode_clips_to_host(
    synthesis_params, clips, *,
    size: int, decode_batch: int = 8, compute_dtype=jnp.float32,
    blur_kernel=(1, 3, 3, 1), uint8_transfer: bool = True,
    chunk_fn=None, frame_callback=None, use_warp_kernel: bool = True,
):
    """Decode SEVERAL clips in one dispatch stream (the batch>1 serving
    path, VERDICT r2 #2).  ``clips`` = list of (s_r (1, dim_w), feats,
    r_d (T_i, dim_w)).  Returns a list of (T_i, S, S, 3) float32 arrays.

    vs a per-clip ``decode_latents_to_host`` loop: chunks from all clips
    share ONE optimistic dispatch stream, one in-flight drain overlap and
    ONE post-loop stats/flags sync — no per-clip ~30 ms tunnel round trip
    and no device idle gap between clips."""
    import numpy as np

    fb = decode_batch
    dtype = jnp.dtype(compute_dtype)
    params_c = _cast_params(synthesis_params, dtype)
    fn = chunk_fn or _decode_chunk
    disp = _ratchet_get(size)

    # per-clip metadata + host outputs; device-side inputs are prepared
    # LAZILY one clip at a time (_prep) so N clips never pin N casted /
    # transposed skip-map copies in HBM simultaneously
    metas = []                      # (t_frames, sizes) per clip
    outs = []
    total_chunks = 0
    for _s_r, _feats, r_d in clips:
        t_frames = r_d.shape[0]
        sizes = _chunk_sizes(t_frames, fb, bucketed=_supports_buckets(chunk_fn))
        metas.append((t_frames, sizes))
        outs.append(np.empty((t_frames, size, size, 3), np.float32))
        total_chunks += len(sizes)

    def _prep(k):
        s_r, feats, r_d = clips[k]
        t_frames, sizes = metas[k]
        wa = (s_r.astype(jnp.float32)
              + r_d.astype(jnp.float32)).astype(dtype)
        if sum(sizes) > t_frames:
            wa = jnp.pad(wa, ((0, sum(sizes) - t_frames), (0, 0)),
                         mode="edge")
        feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1))
                   for f in feats]
        return wa, feats_c

    pending = []                    # (clip_idx, chunk_idx, dev)
    all_stats, all_flags = [], []
    chunk_keys = []                 # (clip_idx, chunk_idx) per dispatch
    n_emitted = 0
    paths = _path_get(size)
    pess = _pessimist_get(size)     # fixup-primary when optimism lost
    for k in range(len(clips)):
        wa, feats_c = _prep(k)
        _t, sizes = metas[k]
        for ci, sz in enumerate(sizes):
            if pess:
                dev, stats = fn(params_c, wa[ci * fb:ci * fb + sz],
                                feats_c, size=size,
                                out_u8=uint8_transfer,
                                blur_kernel=blur_kernel, warp_disp=disp,
                                with_stats=True,
                                use_warp_kernel=use_warp_kernel)
            else:
                dev, stats, flags = fn(params_c, wa[ci * fb:ci * fb + sz],
                                       feats_c, size=size,
                                       out_u8=uint8_transfer,
                                       blur_kernel=blur_kernel,
                                       warp_disp=disp,
                                       with_stats=True, fixup=False,
                                       warp_path=paths,
                                       use_warp_kernel=use_warp_kernel)
                all_flags.append(flags)
            pending.append((k, ci, dev))
            chunk_keys.append((k, ci))
            all_stats.append(stats)
            if len(pending) > 1:
                kk, cc, dv = pending.pop(0)
                _drain((cc, dv), outs[kk], fb, metas[kk][0], uint8_transfer)
                n_emitted += 1
                if frame_callback is not None:
                    frame_callback(n_emitted - 1, total_chunks)
        del wa, feats_c             # free this clip's casted copies
    for kk, cc, dv in pending:
        _drain((cc, dv), outs[kk], fb, metas[kk][0], uint8_transfer)
        n_emitted += 1
        if frame_callback is not None:
            frame_callback(n_emitted - 1, total_chunks)
    if pess:
        _pessimist_fold(size, all_stats)
        return outs
    redo = _sync_stats_flags(size, all_stats, all_flags, paths)
    if redo:
        logger.info("re-decoding %d/%d chunks with the beyond-D fixup "
                    "program", len(redo), total_chunks)
    redo_by_clip = {}
    for di in redo:
        kk, cc = chunk_keys[di]
        redo_by_clip.setdefault(kk, []).append(cc)
    for kk, ccs in redo_by_clip.items():
        wa, feats_c = _prep(kk)
        t_frames, sizes = metas[kk]
        for cc in ccs:
            dev, _ = fn(params_c, wa[cc * fb:cc * fb + sizes[cc]], feats_c,
                        size=size,
                        out_u8=uint8_transfer, blur_kernel=blur_kernel,
                        warp_disp=disp, with_stats=True,
                        use_warp_kernel=use_warp_kernel)
            _drain((cc, dev), outs[kk], fb, t_frames, uint8_transfer)
    return outs
