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
                warp_disp=2, with_stats=False, fixup=True):
    """(fb, dim_w) latents -> (fb, S, S, 3) frames in [0,1] f32 or uint8.

    channels_last runs the NHWC synthesis path (feats must be NHWC): the
    warp kernels get their native layout with no transposes, and the
    output is already HWC.  Set False for the NCHW reference path.

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
                apply_fixup=False)
        elif with_stats:
            img, _, stats = synthesis_cl(params, wa_chunk, feats, size,
                                         blur_kernel=blur_kernel,
                                         warp_disp=warp_disp,
                                         collect_flow_stats=True)
        else:
            img, _ = synthesis_cl(params, wa_chunk, feats, size,
                                  blur_kernel=blur_kernel,
                                  warp_disp=warp_disp)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        img = (img + 1.0) * 0.5
    else:
        img, _ = synthesis(params, wa_chunk, feats, size,
                           blur_kernel=blur_kernel)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        img = (img + 1.0) * 0.5
        img = jnp.transpose(img, (0, 2, 3, 1))
    if out_u8:
        img = jnp.round(img * 255.0).astype(jnp.uint8)
    if with_stats and not fixup:
        return img, stats, flags
    return (img, stats) if with_stats else img


_decode_chunk = partial(jax.jit, static_argnames=(
    "size", "out_u8", "channels_last", "blur_kernel", "warp_disp",
    "with_stats", "fixup"))(_chunk_core)


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
                                       "with_stats", "fixup"))
    def chunk_fn(params, wa_chunk, feats, size, out_u8=False,
                 channels_last=True, blur_kernel=(1, 3, 3, 1),
                 warp_disp=DEFAULT_WARP_DISP, with_stats=False, fixup=True):
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
                              with_stats=with_stats, fixup=fixup)
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
            check_vma=False,
        )(params, wa_chunk, feats)

    return chunk_fn


DEFAULT_WARP_DISP = 2
MAX_WARP_DISP = 7        # the kernels' halo margin bound

# Monotone per-process ratchet of per-level warp D, keyed by image size.
# The first decode chunk of every clip doubles as a flow probe; the
# ratchet only grows, so the static-D chunk programs recompile at most
# (MAX-2)·levels times per process and are then stable.  Exactness never
# depends on the ratchet — flows beyond D hit the cond-gather fixup.
_DISP_RATCHET: dict = {}


def _ratchet_get(size: int) -> tuple:
    from ..models.synthesis import n_kernel_levels
    n = n_kernel_levels(size)
    return _DISP_RATCHET.get(size, (DEFAULT_WARP_DISP,) * n)


def _ratchet_apply(size: int, stats) -> tuple:
    """Fold probe stats into the ratchet (D floor 2: below it the
    align_corners=False half-pixel offset leaves no slack and the fixup
    fires; cap MAX_WARP_DISP = kernel halo margin)."""
    import numpy as np
    s = np.asarray(stats)
    cur = _ratchet_get(size)
    if s.size != len(cur):
        return cur
    new = tuple(int(min(max(int(v), c), MAX_WARP_DISP))
                for v, c in zip(s, cur))
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


def _sync_stats_flags(size: int, all_stats: list, all_flags: list) -> list:
    """One post-loop device sync: ratchet the stats, return the indices
    of chunks whose overflow flags mark them for a fixup re-decode."""
    import numpy as np
    if not all_flags or all_flags[0].shape[0] == 0:
        _ratchet_apply_max(size, all_stats)
        return []
    packed = jnp.concatenate(
        [jnp.stack(all_stats), jnp.stack(all_flags)], axis=1)
    host = np.asarray(packed)                       # single transfer
    n_lv = all_stats[0].shape[0]
    _ratchet_apply(size, host[:, :n_lv].max(axis=0))
    return [int(ci) for ci in np.nonzero(host[:, n_lv:].any(axis=1))[0]]


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
) -> jnp.ndarray:
    """Decode T frames -> (T, size, size, 3) float32 in [0, 1].

    Assumes the reference's B=1 contract (FLOAT.py:119); frame batching
    replaces the reference's per-frame loop.
    """
    t_frames = r_d.shape[0]
    fb = decode_batch
    n_chunks = math.ceil(t_frames / fb)
    t_pad = n_chunks * fb

    dtype = jnp.dtype(compute_dtype)
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    if t_pad != t_frames:
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
    all_stats = []
    all_flags = []
    for ci in range(n_chunks):
        wa_c = wa[ci * fb:(ci + 1) * fb]
        chunk, stats, flags = fn(params_c, wa_c, feats_c, size,
                                 blur_kernel=blur_kernel,
                                 warp_disp=disp, with_stats=True,
                                 fixup=False)
        chunks.append(chunk)
        all_stats.append(stats)
        all_flags.append(flags)
        if frame_callback is not None:
            frame_callback(ci, n_chunks)
    redo = _sync_stats_flags(size, all_stats, all_flags)
    if redo:
        # rare: flows exceeded the ratcheted D this clip (the ratchet just
        # grew for the next one).  First occurrence per process compiles
        # the fixup chunk program — a one-time stall on this transport.
        logger.info("re-decoding %d/%d chunks with the beyond-D fixup "
                    "program", len(redo), n_chunks)
    for ci in redo:
        chunks[ci], _ = fn(params_c, wa[ci * fb:(ci + 1) * fb], feats_c,
                           size, blur_kernel=blur_kernel,
                           warp_disp=disp, with_stats=True)
    frames = jnp.concatenate(chunks, axis=0)
    return frames[:t_frames]


def decode_latents_to_host(
    synthesis_params, s_r, feats, r_d, *,
    size: int, decode_batch: int = 8, compute_dtype=jnp.float32,
    blur_kernel=(1, 3, 3, 1), uint8_transfer: bool = True,
    chunk_fn=None, frame_callback=None,
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
    n_chunks = math.ceil(t_frames / fb)
    t_pad = n_chunks * fb

    dtype = jnp.dtype(compute_dtype)
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    if t_pad != t_frames:
        wa = jnp.pad(wa, ((0, t_pad - t_frames), (0, 0)), mode="edge")
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = _cast_params(synthesis_params, dtype)

    out = np.empty((t_frames, size, size, 3), np.float32)
    pending = []
    fn = chunk_fn or _decode_chunk
    disp = _ratchet_get(size)
    all_stats = []
    all_flags = []
    for ci in range(n_chunks):
        wa_c = wa[ci * fb:(ci + 1) * fb]
        # optimistic fixup-free program; flags + stats folded post-loop
        # in one sync (see decode_latents)
        dev, stats, flags = fn(params_c, wa_c, feats_c, size,
                               out_u8=uint8_transfer,
                               blur_kernel=blur_kernel,
                               warp_disp=disp, with_stats=True,
                               fixup=False)
        pending.append((ci, dev))
        all_stats.append(stats)
        all_flags.append(flags)
        # keep one chunk in flight: materialize the previous one while the
        # current computes
        if len(pending) > 1:
            _drain(pending.pop(0), out, fb, t_frames, uint8_transfer)
        if frame_callback is not None:
            frame_callback(ci, n_chunks)
    for item in pending:
        _drain(item, out, fb, t_frames, uint8_transfer)
    # overflowed chunks: re-decode with the fixup program and re-drain
    redo = _sync_stats_flags(size, all_stats, all_flags)
    if redo:
        logger.info("re-decoding %d/%d chunks with the beyond-D fixup "
                    "program", len(redo), n_chunks)
    for ci in redo:
        dev, _ = fn(params_c, wa[ci * fb:(ci + 1) * fb], feats_c, size,
                    out_u8=uint8_transfer, blur_kernel=blur_kernel,
                    warp_disp=disp, with_stats=True)
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
