"""Face reinsertion compositing — paste generated frames back at the bbox.

The reference delegates this to external SET_CompositeFace /
SET_CompositeFaceFrameByFrame nodes (SURVEY §3.5); the framework provides
the equivalent primitive so the "insert" workflows (incl. two-face) are
expressible end-to-end.
"""
from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def composite_face(
    background: np.ndarray,          # (H, W, 3) float [0,1] or uint8
    face: np.ndarray,                # (S, S, 3) float [0,1]
    bbox: Tuple[int, int, int, int],  # (x, y, w, h) from face_align_crop
    feather: int = 0,                # optional edge feathering radius (px)
) -> np.ndarray:
    """Paste one face frame into the background at bbox; returns float [0,1].

    The bbox may extend beyond the background (the aligner pads with a
    constant border); out-of-bounds regions are clipped.
    """
    bg = background.astype(np.float32)
    if bg.max() > 1.5:
        bg = bg / 255.0
    x, y, w, h = bbox
    face_r = cv2.resize(face.astype(np.float32), (w, h),
                        interpolation=cv2.INTER_AREA if w < face.shape[1]
                        else cv2.INTER_CUBIC)

    hh, ww = bg.shape[:2]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, ww), min(y + h, hh)
    if x0 >= x1 or y0 >= y1:
        return bg
    fx0, fy0 = x0 - x, y0 - y
    fx1, fy1 = fx0 + (x1 - x0), fy0 + (y1 - y0)

    patch = face_r[fy0:fy1, fx0:fx1]
    if feather > 0:
        mask = np.ones(patch.shape[:2], np.float32)
        f = min(feather, min(mask.shape) // 2)
        ramp = np.linspace(0.0, 1.0, f, endpoint=False)
        mask[:f, :] *= ramp[:, None]
        mask[-f:, :] *= ramp[::-1][:, None]
        mask[:, :f] *= ramp[None, :]
        mask[:, -f:] *= ramp[::-1][None, :]
        mask = mask[..., None]
        out_patch = bg[y0:y1, x0:x1] * (1 - mask) + patch * mask
    else:
        out_patch = patch
    out = bg.copy()
    out[y0:y1, x0:x1] = out_patch
    return out


def composite_face_frames(
    background: np.ndarray,          # (H, W, 3) or (T, H, W, 3)
    frames: np.ndarray,              # (T, S, S, 3) float [0,1]
    bbox: Tuple[int, int, int, int],
    feather: int = 0,
    inplace: bool = False,
) -> np.ndarray:
    """Frame-by-frame variant: static background or per-frame backgrounds.

    Equivalent of SET_CompositeFaceFrameByFrame; returns (T, H, W, 3).

    Same output as looping ``composite_face`` (tested), but the
    background normalization / copies / feather mask are hoisted out of
    the per-frame loop: the naive loop re-scanned and re-copied the full
    background 3x per frame, which dominated the two-face insert config
    (~40 ms/frame of pure numpy at 768x1024 — PERF.md config 5).

    ``inplace=True`` with a per-frame float32 background patches it
    directly and returns it (no (T, H, W, 3) copy — the full-stack copy
    is host-memory-bandwidth bound and costs more than all the resizes;
    the multi-face insert loop uses this for faces 2..n)."""
    t = frames.shape[0]
    per_frame_bg = background.ndim == 4
    if per_frame_bg and background.shape[0] != t:
        raise ValueError(
            f"background frames {background.shape[0]} != face frames {t}")
    bg_f = background.astype(np.float32, copy=False)
    if bg_f.max() > 1.5:
        bg_f = bg_f / 255.0

    x, y, w, h = bbox
    hh, ww = bg_f.shape[-3], bg_f.shape[-2]
    if (inplace and per_frame_bg and bg_f is background
            and background.dtype == np.float32):
        out = background
    else:
        out = np.empty((t, hh, ww, 3), np.float32)
        if per_frame_bg:
            np.copyto(out, bg_f)
        else:
            out[:] = bg_f[None]

    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, ww), min(y + h, hh)
    if x0 >= x1 or y0 >= y1:
        return out
    fx0, fy0 = x0 - x, y0 - y
    fx1, fy1 = fx0 + (x1 - x0), fy0 + (y1 - y0)

    mask = None
    if feather > 0:
        mask = np.ones((y1 - y0, x1 - x0), np.float32)
        f = min(feather, min(mask.shape) // 2)
        ramp = np.linspace(0.0, 1.0, f, endpoint=False)
        mask[:f, :] *= ramp[:, None]
        mask[-f:, :] *= ramp[::-1][:, None]
        mask[:, :f] *= ramp[None, :]
        mask[:, -f:] *= ramp[::-1][None, :]
        mask = mask[..., None]

    interp = (cv2.INTER_AREA if w < frames.shape[2] else cv2.INTER_CUBIC)
    for i in range(t):
        face_r = cv2.resize(frames[i].astype(np.float32, copy=False),
                            (w, h), interpolation=interp)
        patch = face_r[fy0:fy1, fx0:fx1]
        if mask is not None:
            out[i, y0:y1, x0:x1] = (out[i, y0:y1, x0:x1] * (1 - mask)
                                    + patch * mask)
        else:
            out[i, y0:y1, x0:x1] = patch
    return out
