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
) -> np.ndarray:
    """Frame-by-frame variant: static background or per-frame backgrounds.

    Equivalent of SET_CompositeFaceFrameByFrame; returns (T, H, W, 3).
    """
    t = frames.shape[0]
    per_frame_bg = background.ndim == 4
    if per_frame_bg and background.shape[0] != t:
        raise ValueError(
            f"background frames {background.shape[0]} != face frames {t}")
    out = np.empty((t,) + (background.shape[-3], background.shape[-2], 3),
                   np.float32)
    for i in range(t):
        bg = background[i] if per_frame_bg else background
        out[i] = composite_face(bg, frames[i], bbox, feather)
    return out
