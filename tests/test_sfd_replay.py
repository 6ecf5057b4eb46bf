"""Realistic detector-box replay through align -> generate -> composite
(VERDICT r3 #7).

The environment lacks the ``face_alignment`` package, so detector-in-the-
loop alignment can't execute for real.  This closes most of the gap:
recorded-style SFD detections (tests/fixtures/sfd_boxes.json — floats in
the height-360 detector space, score-sorted, sub-threshold noise included,
one box past the image edge) are replayed through the pluggable detector,
and the resulting crop/bbox geometry is checked

1. EXACTLY against the reference's own ``process_img``
   (/root/reference/src/nodes/utils/image.py:134-180), imported at runtime
   with ``face_alignment`` shimmed to replay the same boxes, and
2. end-to-end through the two-face insert flow: align both faces ->
   tiny-model generate -> composite both back, asserting frames land at
   the detector-derived bboxes.
"""
import importlib.util
import json
import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from float_tpu.image.face_align import face_align_crop
from float_tpu.image.composite import composite_face_frames

FIXTURE = Path(__file__).parent / "fixtures" / "sfd_boxes.json"
REF_IMAGE_PY = Path("/root/reference/src/nodes/utils/image.py")

with open(FIXTURE) as fh:
    SCENES = {s["name"]: s for s in json.load(fh)["scenes"]}


def scene_image(scene, seed=0):
    h, w = scene["image_hw"]
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # paint a bright disc at each real detection so crops are non-trivial
    det_scale = 360.0 / h
    yy, xx = np.mgrid[:h, :w]
    for (x1, y1, x2, y2, s) in scene["detections"]:
        if s <= 0.95:
            continue
        cx = (x1 + x2) / 2 / det_scale
        cy = (y1 + y2) / 2 / det_scale
        r = (x2 - x1) / 2 / det_scale
        img[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 220
    return img


def replay_detector(scene):
    """detector(img) -> fixture boxes, asserting it sees the 360-px-high
    resized image exactly like the reference feeds SFD."""
    def det(img):
        assert img.shape[0] == 360
        return [tuple(b) for b in scene["detections"]]
    return det


# ---------------------------------------------------------------------------
# 1. exact geometry parity vs the imported reference process_img
# ---------------------------------------------------------------------------

def _load_reference_image_py(boxes):
    """Import the reference utils/image.py with face_alignment shimmed to
    replay ``boxes`` (the package is absent here; the shim only exists so
    the module imports — we never copy its code)."""
    fake = types.ModuleType("face_alignment")
    fake.LandmarksType = types.SimpleNamespace(TWO_D="2D")

    class _FakeFA:
        def __init__(self, *a, **k):
            self.face_detector = types.SimpleNamespace(
                detect_from_image=lambda img: [tuple(b) for b in boxes])

    fake.FaceAlignment = _FakeFA
    old = sys.modules.get("face_alignment")
    sys.modules["face_alignment"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_image_replay", REF_IMAGE_PY)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if old is not None:
            sys.modules["face_alignment"] = old
        else:
            del sys.modules["face_alignment"]
    return mod


@pytest.mark.skipif(not REF_IMAGE_PY.exists(), reason="reference absent")
@pytest.mark.parametrize("name", list(SCENES))
@pytest.mark.parametrize("index", [1, 2])
def test_crop_geometry_matches_reference_process_img(name, index):
    """Same recorded boxes in -> pixel-identical crop and identical bbox
    out, across: normal portrait, two faces (index 1 and 2), a box past
    the image edge (negative coords — trunc-vs-floor territory), and a
    scene where every detection is sub-threshold (center-crop path)."""
    scene = SCENES[name]
    img = scene_image(scene)

    ref_mod = _load_reference_image_py(scene["detections"])
    ref_mod.fa_instance = None          # fresh shim per parametrization
    ref_crop, ref_bbox = ref_mod.process_img(img.copy(), 64, index=index)

    crop, bbox = face_align_crop(img.copy(), 64, index=index,
                                 detector=replay_detector(scene))
    assert bbox == tuple(ref_bbox)
    np.testing.assert_array_equal(crop, ref_crop)


@pytest.mark.skipif(not REF_IMAGE_PY.exists(), reason="reference absent")
def test_crop_geometry_matches_reference_margin_sweep():
    """Margin is a user widget (AdvancedFaceCrop): sweep it on the edge
    scene where the padded-border arithmetic is most delicate."""
    scene = SCENES["edge_face_540"]
    img = scene_image(scene, seed=3)
    for margin in (1.0, 1.6, 2.4):
        ref_mod = _load_reference_image_py(scene["detections"])
        ref_crop, ref_bbox = ref_mod.process_img(img.copy(), 48,
                                                 margin=margin)
        crop, bbox = face_align_crop(img.copy(), 48, margin=margin,
                                     detector=replay_detector(scene))
        assert bbox == tuple(ref_bbox)
        np.testing.assert_array_equal(crop, ref_crop)


# ---------------------------------------------------------------------------
# 2. end-to-end: two-face align -> generate -> composite
# ---------------------------------------------------------------------------

def test_two_face_insert_with_replayed_boxes():
    """The full insert flow on the two-face scene: crop face 1 and face 2
    via replayed detections, run the tiny pipeline on each crop, paste
    both clips back — composited pixels change exactly inside the two
    (clipped) bboxes and nowhere else."""
    import jax.numpy as jnp
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    scene = SCENES["two_faces_720x1280"]
    img = scene_image(scene, seed=1)
    pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    rng = np.random.default_rng(11)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)

    bg = img.astype(np.float32) / 255.0
    out = bg
    bboxes = []
    for index in (1, 2):
        crop, bbox = face_align_crop(img.copy(), TINY.input_size,
                                     index=index,
                                     detector=replay_detector(scene))
        assert crop.shape == (TINY.input_size, TINY.input_size, 3)
        x = jnp.asarray(crop.astype(np.float32) / 255.0 * 2.0 - 1.0)
        x = jnp.transpose(x, (2, 0, 1))[None]
        frames = np.asarray(pipe.generate(x, wave, emotion="none",
                                          seed=index))
        assert frames.ndim == 4 and frames.shape[-1] == 3
        out = composite_face_frames(out, frames, bbox)[-1]
        bboxes.append(bbox)

    # the two detector boxes map to disjoint crops; pixels outside both
    # (clipped) bboxes are untouched
    h, w = bg.shape[:2]
    mask = np.zeros((h, w), bool)
    for (x, y, bw, bh) in bboxes:
        mask[max(y, 0):min(y + bh, h), max(x, 0):min(x + bw, w)] = True
    changed = np.any(out != bg, axis=-1)
    assert changed[mask].mean() > 0.5       # faces actually replaced
    assert not changed[~mask].any()          # background untouched
    x0, y0, w0, h0 = bboxes[0]
    x1b, y1b, w1b, h1b = bboxes[1]
    assert x0 + w0 <= x1b or x1b + w1b <= x0  # boxes disjoint in x


def test_replay_detector_runtime_failure_center_crops():
    """A detector that raises at runtime (not ImportError) degrades to the
    reference's center-crop path, like a real SFD inference failure."""
    scene = SCENES["portrait_768"]
    img = scene_image(scene)

    def broken(im):
        raise RuntimeError("detector inference failed")

    crop, bbox = face_align_crop(img, 64, detector=broken)
    h, w = img.shape[:2]
    half = min(h // 2, w // 2)
    assert bbox == (w // 2 - half, h // 2 - half, 2 * half, 2 * half)
    assert crop.shape == (64, 64, 3)
