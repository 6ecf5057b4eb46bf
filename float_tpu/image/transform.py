"""Image -> model-input transform (reference CustomTransform,
src/nodes/generate.py:29-39): cv2 INTER_AREA resize to input_size²,
normalize x/127.5 - 1, HWC -> CHW float32."""
from __future__ import annotations

import cv2
import numpy as np


def to_model_input(img_u8: np.ndarray, input_size: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (1, 3, S, S) float32 in [-1, 1]."""
    if img_u8.shape[0] != input_size or img_u8.shape[1] != input_size:
        img_u8 = cv2.resize(img_u8, (input_size, input_size),
                            interpolation=cv2.INTER_AREA)
    x = img_u8.astype(np.float32) / 127.5 - 1.0
    return np.transpose(x, (2, 0, 1))[None]


def comfy_image_to_model_input(image, input_size: int,
                               rgba_conversion: str = "blend_with_color",
                               bkg_color_hex: str = "#000000",
                               face_align=False,   # bool | "fallback"
                               face_margin: float = 1.6,
                               face_index: int = 1,
                               detector=None):
    """Full preprocess: [0,1] HWC image -> model input (+bbox if aligned).

    Mirrors DataProcessor.preprocess (reference: generate.py:75-81).
    Returns (model_input (1,3,S,S) float32, bbox or None).
    """
    from .rgba import image_to_uint8
    from .face_align import face_align_crop

    u8 = image_to_uint8(np.asarray(image), rgba_conversion, bkg_color_hex)
    bbox = None
    if face_align:
        u8, bbox = face_align_crop(
            u8, input_size, margin=face_margin, index=face_index,
            detector=detector,
            allow_fallback=(face_align == "fallback"))
    return to_model_input(u8, input_size), bbox
