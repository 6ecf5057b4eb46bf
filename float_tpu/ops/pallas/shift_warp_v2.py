"""Generalized frame-lane-packed static-shift warp (v2).

The decode-path warp: ONE shared encoder feature map per level, B per-frame
flow grids (reference op: grid_sample, zeros padding, align_corners=False —
/root/reference/src/nodes/models/float/styledecoder.py:423).  Bilinear
sampling with per-pixel displacement |Δ| <= D is an exact sum over
(2D+2)² static taps with hat weights; this kernel evaluates it in VMEM.

Improvements over round-1's shift_warp_packed/shift_warp_kernel:

- GROUPS ∈ {1, 2, 4}: levels with C = 128 / 64 / 32 channels pack 1 / 2 / 4
  frames into the 128-lane datapath (the shared feat is lane-tiled), so the
  256² level (C=64) stops wasting half its lanes and every level runs with
  full lane occupancy.
- dx-OUTER tap loop over whole-window column slices: ONE misaligned-sublane
  slice (the expensive rotate) of the (WR, TC, 128) window per dx instead of
  one per (dy, dx) tap — (2D+2)× fewer rotated rows.  The dy loop then
  slices the leading (untiled) dim, which takes arbitrary offsets for free.
- hoisted lane-expanded weight fields for BOTH axes (wy per dy, wx per dx),
  built once per tile via per-group lane masks: field = Σ_g w_g ⊗ mask_g
  (lane-splat FMAs, no per-tap selects).  Per tap only 2 FMAs remain.
- parametric D: taps = (2D+2)²; the decode loop probes the clip's real flow
  magnitudes and dispatches the smallest safe D (runtime-adaptive; see
  runtime/decode.py).  Exactness for flows beyond D comes from the caller's
  cond-gather fixup, as before.
- window DMA cached across frames: grid iterates frame-groups innermost and
  re-DMAs the (shared) window only when the tile changes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TC = 128
MAX_DISP = 7                   # ratchet cap (margin = d + 1 <= 8)


def _margin(d: int) -> int:
    """Halo width: the taps span [-d, d+1] so d+1 suffices; keeping it
    minimal shrinks the window DMA and the cached rotated slices."""
    return d + 1


def _ceil8(x: int) -> int:
    return (x + 7) // 8 * 8


def _hat_fields_at(fs, base_abs, size, off, groups):
    """Per-group hat weights at one tap offset: list of (TR, TC) f32."""
    tap = base_abs + off
    valid = (tap >= 0) & (tap < size)
    return [jnp.where(valid, jnp.maximum(0.0, 1.0 - jnp.abs(fs[g] - tap)),
                      0.0) for g in range(groups)]


def _kernel(gy_ref, gx_ref, feat_hbm, out_ref, ovf_ref, win, win_rot, sem,
            *, h, w, d, groups, tr, nb, out_dtype, path, w_rgb_ref=None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bb = pl.program_id(2)

    m = _margin(d)
    # HBM DMA slices want 8-multiple extents: round the window up (the
    # wrapper pads the feat accordingly; extra rows/cols are never read)
    wr = _ceil8(tr + 2 * m)
    wc = _ceil8(TC + 2 * m)
    n_taps = 2 * d + 2

    # ONE invocation per tile handles a BLOCK of nb frame-groups:
    # per-invocation overhead (prologue, block in/out orchestration)
    # measured ~7x the actual FMA work when the grid carried every frame
    # group.  The window DMA and the pre-rotated column slices (the
    # expensive misaligned-sublane ops) are shared by every frame-group
    # of the tile and cached across block steps in scratch.
    @pl.when(bb == 0)
    def _copy():
        rs = pl.multiple_of(i * tr, 8)
        cs = pl.multiple_of(j * TC, 8)
        dma = pltpu.make_async_copy(
            feat_hbm.at[0, pl.ds(rs, wr), pl.ds(cs, wc)], win, sem)
        dma.start()
        dma.wait()
        for dx_i, dx in enumerate(range(-d, d + 2)):
            win_rot[dx_i] = win[:, m + dx: m + dx + TC, :]

    r_abs = (i * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, TC), 0)
             ).astype(jnp.float32)
    c_abs = (j * TC + jax.lax.broadcasted_iota(jnp.int32, (tr, TC), 1)
             ).astype(jnp.float32)

    # per-group lane masks (1, 1, 128) — FMA lane expansion, no selects
    cg = 128 // groups
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    gmasks = [(lane // cg == g).astype(jnp.float32) for g in range(groups)]

    def lane_expand(smalls):
        """Σ_g smalls[g] ⊗ mask_g -> (tr, TC, 128) f32."""
        if groups == 1:
            return smalls[0][:, :, None]
        acc = smalls[0][:, :, None] * gmasks[0]
        for g in range(1, groups):
            acc = acc + smalls[g][:, :, None] * gmasks[g]
        return acc

    def frame_group(bg, _):
        # per-group pixel-center coordinate fields
        fys, fxs = [], []
        for g in range(groups):
            gy = gy_ref[bg, g].astype(jnp.float32)
            gx = gx_ref[bg, g].astype(jnp.float32)
            fys.append(((gy + 1.0) * h - 1.0) * 0.5)
            fxs.append(((gx + 1.0) * w - 1.0) * 0.5)

        # beyond-D overflow flag, same semantics as the host-side
        # _overflow_mask (in-image taps only): the wrapper's fixup cond
        # keys on this scalar, so the per-pixel mask fields are only
        # ever computed inside the (rare) fixup branch
        ovf = jnp.zeros((), jnp.float32)
        for g in range(groups):
            y0 = jnp.floor(fys[g])
            x0 = jnp.floor(fxs[g])
            rel = ((y0 + 1 >= 0) & (y0 < h)
                   & (x0 + 1 >= 0) & (x0 < w))
            far = (jnp.abs(y0 - r_abs) > d) | (jnp.abs(x0 - c_abs) > d)
            ovf = jnp.maximum(ovf, jnp.max((far & rel).astype(jnp.float32)))
        # max-accumulate into the SMEM scalars (grid is sequential:
        # dimension_semantics all "arbitrary")
        first = (i == 0) & (j == 0) & (bb == 0) & (bg == 0)
        prev = jnp.where(first, 0, ovf_ref[0])
        ovf_ref[0] = jnp.maximum(prev, ovf.astype(jnp.int32))

        def taps(dl: int, hoist: bool = True):
            """Exact bilinear tap sum for displacements up to ``dl``.

            ``hoist=True`` keeps the nt lane-expanded horizontal weight
            fields live across the dy loop (fast, more VMEM); the
            recentered fast4 path has made this the RARE branch, so its
            cond variant uses hoist=False to keep the kernel's peak VMEM
            at the fast path's footprint."""
            nt = 2 * dl + 2
            if hoist:
                wxf = [
                    lane_expand(_hat_fields_at(fxs, c_abs, w, dx, groups))
                    for dx in range(-dl, dl + 2)
                ]
            else:
                wxf = None

            def body(t, acc):
                dyf = (t - dl).astype(jnp.float32)
                tap_y = r_abs + dyf
                valid_y = (tap_y >= 0) & (tap_y < h)
                wy_l = lane_expand([
                    jnp.where(valid_y,
                              jnp.maximum(0.0,
                                          1.0 - jnp.abs(fys[g] - tap_y)),
                              0.0)
                    for g in range(groups)])
                # factored bilinear sum: S(dy) = Σ_dx wx·f, acc += wy·S —
                # nt FMAs + 1 instead of 2 ops per tap.  (A fully-unrolled
                # dy loop blows the 16 MB VMEM stack.)
                row = pl.ds(m - dl + t, tr)

                def wx(k):
                    if wxf is not None:
                        return wxf[k]
                    return lane_expand(_hat_fields_at(
                        fxs, c_abs, w, k - dl, groups))

                s = wx(0) * win_rot[d - dl, row].astype(jnp.float32)
                for k in range(1, nt):
                    # free slice: leading dims of the rotated windows
                    sl = win_rot[d - dl + k, row]
                    s = s + wx(k) * sl.astype(jnp.float32)
                return acc + wy_l * s

            return jax.lax.fori_loop(0, nt, body,
                                     jnp.zeros((tr, TC, 128), jnp.float32))

        def fastn(n, oy, ox):
            """Recentered exact n x n-tap bilinear: taps at rows
            oy + [-1, n-2] and pre-rotated columns ox + [-1, n-2].  Valid
            whenever the tile's local integer-displacement spread fits a
            width-(n-2) window (checked by the caller); out-of-image taps
            read the zero padding, which IS grid_sample's zeros semantics.

            Weight fields come from RELATIVE lane-expanded coordinate
            fields built once per frame-group: each hat field is then 4
            plain full-width VPU ops with a scalar offset — the per-tap
            lane-splat FMAs of lane_expand (a splat is ~2 passes/vreg)
            were the kernel's dominant cost at groups=4."""
            oyf = oy.astype(jnp.float32)
            oxf = ox.astype(jnp.float32)
            # relative displacement fields (small subs first, ONE expand)
            dy_l = lane_expand([fys[g] - r_abs for g in range(groups)])
            dx_l = lane_expand([fxs[g] - c_abs for g in range(groups)])
            wxf = [
                jnp.maximum(0.0, 1.0 - jnp.abs(dx_l - (oxf + (k - 1.0))))
                for k in range(n)
            ]
            acc = jnp.zeros((tr, TC, 128), jnp.float32)
            for t in range(n):
                wy_l = jnp.maximum(0.0, 1.0 - jnp.abs(dy_l - (oyf + (t - 1.0))))
                row = pl.ds(m + oy - 1 + t, tr)
                s = jnp.zeros((tr, TC, 128), jnp.float32)
                for k in range(n):
                    sl = win_rot[pl.ds(d + ox + (k - 1), 1), row][0]
                    s = s + wxf[k] * sl.astype(jnp.float32)
                acc = acc + wy_l * s
            return acc

        if d <= 1:
            acc = taps(d)
            # -1 = "no spread statistic computed", matching warp_cl's
            # non-v2 paths — 0 would make _path_fold read a valid spread
            # and select fast4 for a program that never measured one
            ovf_ref[1] = jnp.where(first, -1, ovf_ref[1])
        else:
            # flows are spatially smooth: within one (tile, frame-group
            # block) the integer displacements almost always span <= 2, so
            # a shared integer recentering (oy, ox) makes an exact 4x4-tap
            # path cover ANY local displacement window — the (2D+2)² path
            # only remains for tiles whose local spread exceeds 2.
            big = jnp.float32(1e9)
            dy_mn = dx_mn = big
            dy_mx = dx_mx = -big
            df = jnp.float32(d)
            for g in range(groups):
                # clip to the kernel's coverage: |disp| > d pixels are the
                # host fixup's job (their hat weights vanish at any
                # recentered tap), so they must not block the fast paths
                dy = jnp.clip(jnp.floor(fys[g]) - r_abs, -df, df)
                dx = jnp.clip(jnp.floor(fxs[g]) - c_abs, -df, df)
                dy_mn = jnp.minimum(dy_mn, jnp.min(dy))
                dy_mx = jnp.maximum(dy_mx, jnp.max(dy))
                dx_mn = jnp.minimum(dx_mn, jnp.min(dx))
                dx_mx = jnp.maximum(dx_mx, jnp.max(dx))
            # the tile-block's local displacement spread: the statistic
            # the trace-time path ratchet keys on (a recentered n-tap
            # path is exact iff spread <= n - 2)
            spread = jnp.maximum(dy_mx - dy_mn, dx_mx - dx_mn).astype(jnp.int32)
            sprev = jnp.where(first, 0, ovf_ref[1])
            ovf_ref[1] = jnp.maximum(sprev, spread)
            # a recentered n-tap path covers taps [dy_mn, dy_mx+1] within
            # [oy-1, oy+n-2] (feasible iff local spread <= n-2); clamps
            # keep the row slice inside the window and the column index
            # inside win_rot's [-d, d+1] range: oy, ox in [1-d, d+3-n]
            def offsets(n):
                lo, hi = 1 - d, d + 3 - n
                oy = jnp.clip(dy_mx.astype(jnp.int32) + 3 - n, lo, hi)
                ox = jnp.clip(dx_mx.astype(jnp.int32) + 3 - n, lo, hi)
                cov = ((dy_mn >= oy - 1) & (dy_mx + 1 <= oy + n - 2)
                       & (dx_mn >= ox - 1) & (dx_mx + 1 <= ox + n - 2))
                return oy, ox, cov

            if path == "fast3":
                # 9-tap tier (spread <= 1): the smallest recentered path —
                # bilinear needs a 2x2 window per pixel, +1 for the spread
                oy3, ox3, _ = offsets(3)
                acc = fastn(3, oy3, ox3)
            elif path == "fast4":
                # trace-time-selected: NO conds; exact iff every tile
                # block's spread <= 2, which the caller validates from the
                # SMEM spread stat at its post-loop sync (invalid chunks
                # re-decode with the auto program; runtime/decode.py)
                oy4, ox4, _ = offsets(4)
                acc = fastn(4, oy4, ox4)
            elif path == "fast5":
                # 25-tap middle tier (spread <= 3): 30% less VPU work
                # than fast6 when the clip regime sits exactly at 3
                oy5, ox5, _ = offsets(5)
                acc = fastn(5, oy5, ox5)
            elif path == "fast6":
                # cond-free middle tier: exact iff spread <= 4 — at d == 2
                # that is TOTAL coverage (spread is clipped to 2d)
                oy6, ox6, _ = offsets(6)
                acc = fastn(6, oy6, ox6)
            else:
                oy4, ox4, cov4 = offsets(4)
                # middle tier: 6x6 taps cover spread <= 4 — at d == 2 that
                # is TOTAL coverage (any |disp| <= 2 window fits), so the
                # (2D+2)² fallback only survives for d >= 3 outlier tiles
                oy6, ox6, cov6 = offsets(6)
                slow = lambda: jax.lax.cond(
                    cov6, lambda: fastn(6, oy6, ox6),
                    lambda: taps(d, hoist=False))
                acc = jax.lax.cond(cov4, lambda: fastn(4, oy4, ox4), slow)
        if w_rgb_ref is not None:
            # ToRGB epilogue (last level only): the packed warp's sole
            # consumer is a block-diagonal 1×1 conv, so contract the 128
            # packed lanes against kron(I_groups, W_rgb) HERE on the f32
            # accumulator — the (nbg, H, W, 128) tensor never reaches HBM
            # (268 -> 34 MB at 512²) and the downstream einsum pass
            # disappears.
            wl = w_rgb_ref[...].astype(jnp.float32)        # (128, 4·groups)
            rgb = jax.lax.dot_general(
                acc.reshape(tr * TC, 128), wl,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(bg, 1)] = rgb.reshape(
                tr, TC, wl.shape[1]).astype(out_dtype)[None]
        else:
            out_ref[pl.ds(bg, 1)] = acc.astype(out_dtype)[None]
        return 0

    jax.lax.fori_loop(0, nb, frame_group, 0)


def _kernel_rgb(gy_ref, gx_ref, feat_hbm, w_rgb_ref, out_ref, ovf_ref,
                win, win_rot, sem, **kw):
    return _kernel(gy_ref, gx_ref, feat_hbm, out_ref, ovf_ref, win,
                   win_rot, sem, w_rgb_ref=w_rgb_ref, **kw)


@functools.partial(jax.jit, static_argnames=("d", "groups", "tr", "path"))
def _packed_warp_v2(feat_tiled, gyg, gxg, d: int, groups: int, tr: int,
                    path: str = "auto"):
    """feat_tiled (1, H+2M, W+2M, 128) lane-tiled shared feat;
    gyg/gxg (B//groups, groups, H, W) -> (B//groups, H, W, 128).

    ``path``: 'auto' = per-tile cond chain (exact for any flow within D);
    'fast4'/'fast6' = the trace-time-selected cond-free recentered path —
    exact iff every tile block's local spread <= 2 / 4, validated by the
    caller from the returned spread stat (flags[1])."""
    nbg = gyg.shape[0]
    m = _margin(d)
    h, w = gyg.shape[2], gyg.shape[3]
    out_dtype = feat_tiled.dtype
    wr, wc = _ceil8(tr + 2 * m), _ceil8(TC + 2 * m)

    # frame-group block size: largest divisor of nbg <= 4 (VMEM bounds
    # the per-invocation out block; the cached window amortizes the rest)
    nb = max(n for n in (4, 3, 2, 1) if nbg % n == 0)

    kern = functools.partial(_kernel, h=h, w=w, d=d, groups=groups, tr=tr,
                             nb=nb, out_dtype=out_dtype, path=path)
    return pl.pallas_call(
        kern,
        grid=(h // tr, w // TC, nbg // nb),
        in_specs=[
            pl.BlockSpec((nb, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec((nb, tr, TC, 128),
                                lambda i, j, b: (b, i, j, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nbg, h, w, 128), out_dtype),
                   # [beyond-D overflow flag, max local spread]
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((wr, wc, 128), feat_tiled.dtype),
            pltpu.VMEM((2 * d + 2, wr, TC, 128), feat_tiled.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nbg * h * w * 128 * (2 * d + 2) ** 2,
            bytes_accessed=nbg * h * w * 128 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # block steps innermost and in-order: the cached window in
            # scratch must stay valid for bb > 0
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # the recentered fast4 + rare-path taps coexist across the
            # cond, pushing the conservative stack bound past the 16 MB
            # default; v5e has headroom above it
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
    )(gyg, gxg, feat_tiled)


@functools.partial(jax.jit, static_argnames=("d", "groups", "tr", "path"))
def _packed_warp_v2_rgb(feat_tiled, gyg, gxg, wblk, d: int, groups: int,
                        tr: int, path: str = "auto"):
    """_packed_warp_v2 with the ToRGB matmul fused into the kernel
    epilogue: ``wblk`` (128, 4·groups) = kron(I_groups, W_rgb_padded)
    contracts the packed lanes in-kernel; returns
    ((B//groups, H, W, 4·groups), flags) — lane g·4+o holds RGB channel
    o (< 3) of frame-group member g."""
    nbg = gyg.shape[0]
    m = _margin(d)
    h, w = gyg.shape[2], gyg.shape[3]
    out_dtype = feat_tiled.dtype
    wr, wc = _ceil8(tr + 2 * m), _ceil8(TC + 2 * m)
    nb = max(n for n in (4, 3, 2, 1) if nbg % n == 0)
    no = 4 * groups

    kern = functools.partial(_kernel_rgb, h=h, w=w, d=d, groups=groups,
                             tr=tr, nb=nb, out_dtype=out_dtype, path=path)
    return pl.pallas_call(
        kern,
        grid=(h // tr, w // TC, nbg // nb),
        in_specs=[
            pl.BlockSpec((nb, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, groups, tr, TC), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((128, no), lambda i, j, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((nb, tr, TC, no),
                                lambda i, j, b: (b, i, j, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nbg, h, w, no), out_dtype),
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((wr, wc, 128), feat_tiled.dtype),
            pltpu.VMEM((2 * d + 2, wr, TC, 128), feat_tiled.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nbg * h * w * 128 * ((2 * d + 2) ** 2 + no),
            bytes_accessed=nbg * h * w * (128 * 2 + no * 2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
    )(gyg, gxg, feat_tiled, wblk)


def warp_shared_feat_v2_packed_rgb(feat1_nhwc, grid, wk_rgb,
                                   max_disp: int = 3, tr: int = 8,
                                   path: str = "auto"):
    """Packed warp + in-kernel ToRGB contraction (optimistic mode only).

    ``wk_rgb`` (3, C) f32: the equalized-scaled 1×1 ToRGB weight.  Returns
    (rgb_p (B//groups, H, W, 4·groups), flags (2,), groups); unpack with
    rgb_p.reshape(bg, H, W, groups, 4)[..., :3] -> per-frame RGB."""
    assert max_disp >= 2 or path == "auto"
    m = _margin(max_disp)
    _, h, w, c = feat1_nhwc.shape
    b = grid.shape[0]
    groups = pick_groups(c, b)
    cg = 128 // groups
    fpad = feat1_nhwc if c == cg else jnp.pad(
        feat1_nhwc, ((0, 0), (0, 0), (0, 0), (0, cg - c)))
    ftile = fpad if groups == 1 else jnp.tile(fpad, (1, 1, 1, groups))
    pad_r = _ceil8(tr + 2 * m) - tr - m
    pad_c = _ceil8(TC + 2 * m) - TC - m
    ftile = jnp.pad(ftile, ((0, 0), (m, pad_r), (m, pad_c), (0, 0)))
    gyg = grid[..., 1].reshape(b // groups, groups, h, w)
    gxg = grid[..., 0].reshape(b // groups, groups, h, w)
    # (128, 4·groups) block-diagonal weight: lanes g·cg+i -> out g·4+o
    wk4 = jnp.pad(wk_rgb.astype(jnp.float32), ((0, 1), (0, cg - c)))  # (4, cg)
    wblk = jnp.kron(jnp.eye(groups, dtype=jnp.float32), wk4.T)  # (128, 4g)
    rgb_p, flags = _packed_warp_v2_rgb(ftile, gyg, gxg, wblk, max_disp,
                                       groups, tr, path)
    return rgb_p, flags, groups


def pick_groups(c: int, b: int) -> int:
    """Largest lane-packing factor the level supports."""
    for g in (4, 2, 1):
        if c * g <= 128 and b % g == 0:
            return g
    return 1


def v2_eligible(feat_shape, dtype) -> bool:
    """Same routing condition as ops.nhwc.warp_cl's v2 branch."""
    _, h, w, c = feat_shape
    return (dtype == jnp.bfloat16 and h >= 128 and c <= 128
            and h % 8 == 0 and w % 128 == 0)


def warp_shared_feat_v2_packed(feat1_nhwc: jnp.ndarray, grid: jnp.ndarray,
                               max_disp: int = 3, tr: int = 8,
                               path: str = "auto", g_major: bool = False):
    """Optimistic packed-OUTPUT variant: returns (packed (B//groups, H, W,
    128), flags (2,), groups) keeping the kernel's frame-lane packing.

    The standard wrapper's lane-unpack (reshape + transpose back to
    (B, H, W, C)) relayouts the full-resolution tensor several times —
    profiled at ~8 ms/chunk at 512², as much as the warp kernels
    themselves.  A consumer that can work on the packed layout (the
    last-level ToRGB: a 1×1 conv = block-diagonal matmul over the lanes,
    models/synthesis._to_flow_rgb_packed_cl) skips that entirely and
    unpacks only its own 3-channel output.

    ``g_major``: lane-group g of packed row bg holds frame g·(B/groups)+bg
    instead of bg·groups+g — then the per-frame unpack is a plain
    lane-slice concat along batch (measured 2.84 vs 4.48 ms for the
    reshape+transpose form at 256²×16f on chip, experiments/
    unpack_bench.py); the grid reorder is two (B, H, W) leading-dim
    transposes that fuse upstream."""
    assert max_disp >= 2 or path == "auto"
    m = _margin(max_disp)
    _, h, w, c = feat1_nhwc.shape
    b = grid.shape[0]
    groups = pick_groups(c, b)
    cg = 128 // groups
    fpad = feat1_nhwc if c == cg else jnp.pad(
        feat1_nhwc, ((0, 0), (0, 0), (0, 0), (0, cg - c)))
    ftile = fpad if groups == 1 else jnp.tile(fpad, (1, 1, 1, groups))
    pad_r = _ceil8(tr + 2 * m) - tr - m
    pad_c = _ceil8(TC + 2 * m) - TC - m
    ftile = jnp.pad(ftile, ((0, 0), (m, pad_r), (m, pad_c), (0, 0)))
    if g_major and groups > 1:
        gyg = jnp.swapaxes(
            grid[..., 1].reshape(groups, b // groups, h, w), 0, 1)
        gxg = jnp.swapaxes(
            grid[..., 0].reshape(groups, b // groups, h, w), 0, 1)
    else:
        gyg = grid[..., 1].reshape(b // groups, groups, h, w)
        gxg = grid[..., 0].reshape(b // groups, groups, h, w)
    packed, flags = _packed_warp_v2(ftile, gyg, gxg, max_disp, groups,
                                    tr, path)
    return packed, flags, groups


def warp_shared_feat_v2(feat1_nhwc: jnp.ndarray, grid: jnp.ndarray,
                        max_disp: int = 3, tr: int = 8,
                        apply_fixup: bool = True, path: str = "auto"):
    """Warp ONE shared feature map (1, H, W, C) with B per-frame grids
    (B, H, W, 2) -> (B, H, W, C) NHWC.  Exact for arbitrary flows via the
    cond-gather fixup beyond ``max_disp``.

    ``apply_fixup=False`` is the OPTIMISTIC mode: returns
    (out, flags (2,) int32 = [beyond-D overflow, max local spread])
    without the fixup cond — even a never-taken cond costs XLA
    conditional-boundary copies of the (B, H, W, C) operand (~2-3 ms at
    512²).  The caller must treat flags[0] > 0 chunks as invalid and
    re-run them with apply_fixup=True (runtime/decode.py's optimistic
    loop does).

    ``path`` != 'auto' selects the cond-free recentered fast path at
    trace time (optimistic mode only): a recentered n-tap path ('fast3'
    … 'fast6') is exact iff flags[1] <= n - 2 — the caller validates and
    re-decodes misses with the auto program."""
    from ..nhwc import grid_sample_bilinear_nhwc
    from .shift_warp_kernel import _overflow_mask

    assert max_disp <= MAX_DISP, (max_disp, MAX_DISP)
    assert path == "auto" or (not apply_fixup and max_disp >= 2), \
        "trace-time path selection requires optimistic mode and D >= 2"
    _, h, w, c = feat1_nhwc.shape
    b = grid.shape[0]
    gy = grid[..., 1]
    gx = grid[..., 0]

    packed, ovf_flags, groups = warp_shared_feat_v2_packed(
        feat1_nhwc, grid, max_disp, tr, path, g_major=True)
    cg = 128 // groups
    if groups == 1:
        out = packed[..., :c]
    else:
        # g-major packing makes the per-frame unpack a lane-slice concat
        # (frame g·nbg+bg sits in lane-group g of row bg) — 1.6x cheaper
        # than the reshape+transpose relayout (experiments/unpack_bench.py)
        out = jnp.concatenate([packed[..., g * cg:g * cg + c]
                               for g in range(groups)], axis=0)

    if not apply_fixup:
        return out, ovf_flags

    def fix(o):
        # the per-pixel overflow mask is ONLY computed here — the cond
        # predicate comes from the kernel's tiny per-tile flags, so the
        # common no-overflow case skips these (B, H, W) field ops
        # entirely (~3-5 ms/chunk at 512²).
        overflow = _overflow_mask(h, w, gy, gx, max_disp)

        # sequential per-frame gather: the patch tensor of a batched
        # gather ((B, H·W, 2, 2, C)) is allocated even when this branch
        # is not taken, which blows HBM at large frame batches.  The
        # fixup is the rare path — lax.map keeps its footprint at 1/B,
        # and the inner cond skips frames with no overflowing pixel
        # (overflow is typically confined to 1-2 frames of a chunk).
        def one(args):
            oi, gi, ovi = args

            def exact():
                full = grid_sample_bilinear_nhwc(feat1_nhwc, gi[None])[0]
                return jnp.where(ovi[..., None], full, oi)

            return jax.lax.cond(jnp.any(ovi), exact, lambda: oi)
        return jax.lax.map(one, (o, grid, overflow))

    return jax.lax.cond(ovf_flags[0] > 0, fix, lambda o: o, out)
