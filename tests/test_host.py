"""Host-side pre/post-processing tests (image, audio)."""
import numpy as np
import pytest

from float_tpu.image.rgba import hex_to_rgb_uint8, rgba_to_rgb, image_to_uint8
from float_tpu.image.face_align import face_align_crop
from float_tpu.image.composite import composite_face, composite_face_frames
from float_tpu.image.transform import to_model_input
from float_tpu.audio.resample import to_mono, resample, comfy_audio_to_mono_16k
from float_tpu.audio.features import normalize_waveform, extract_features


def test_hex_colors():
    assert hex_to_rgb_uint8("#ff0080") == (255, 0, 128)
    assert hex_to_rgb_uint8("00ff00") == (0, 255, 0)
    assert hex_to_rgb_uint8("bogus") == (0, 0, 0)


def test_rgba_strategies():
    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 0] = 200                      # red
    img[0, 0, 3] = 255                     # opaque
    img[0, 1, 3] = 128                     # half
    # (1, x, 3) = 0 -> transparent
    out_d = rgba_to_rgb(img, "discard_alpha", "#0000ff")
    np.testing.assert_array_equal(out_d, img[..., :3])

    out_b = rgba_to_rgb(img, "blend_with_color", "#0000ff")
    np.testing.assert_array_equal(out_b[0, 0], [200, 0, 0])        # opaque
    np.testing.assert_array_equal(out_b[1, 0], [0, 0, 255])        # bg
    assert abs(int(out_b[0, 1, 0]) - 100) <= 1                     # half blend
    assert abs(int(out_b[0, 1, 2]) - 127) <= 1

    out_r = rgba_to_rgb(img, "replace_with_color", "#0000ff")
    np.testing.assert_array_equal(out_r[0, 1], [200, 0, 0])        # kept
    np.testing.assert_array_equal(out_r[1, 1], [0, 0, 255])        # replaced


def test_image_to_uint8_batch_and_range():
    img = np.random.rand(2, 8, 8, 3).astype(np.float32)
    u8 = image_to_uint8(img)
    assert u8.shape == (8, 8, 3) and u8.dtype == np.uint8


def test_face_align_center_fallback():
    """No detector -> reference's center square crop geometry."""
    img = (np.random.rand(100, 160, 3) * 255).astype(np.uint8)
    crop, bbox = face_align_crop(img, 64, detector=lambda im: [])
    assert crop.shape == (64, 64, 3)
    assert bbox == (80 - 50, 0, 100, 100)


def test_face_align_with_synthetic_detector():
    """Detector box -> margin crop geometry parity (bbox math from spec)."""
    img = (np.random.rand(360, 360, 3) * 255).astype(np.uint8)
    det = lambda im: [(100.0, 120.0, 200.0, 240.0, 0.99)]
    crop, bbox = face_align_crop(img, 64, margin=1.6, detector=det)
    assert crop.shape == (64, 64, 3)
    # half sizes (50, 60) -> bs = 60*1.6 = 96; center (150, 180)
    assert bbox == (150 - 96, 180 - 96, 192, 192)


def test_composite_roundtrip():
    bg = np.zeros((64, 64, 3), np.float32)
    face = np.ones((16, 16, 3), np.float32)
    out = composite_face(bg, face, (10, 20, 8, 8))
    assert out[20, 10, 0] == 1.0 and out[27, 17, 0] == 1.0
    assert out[19, 10, 0] == 0.0 and out[28, 18, 0] == 0.0

    frames = np.ones((3, 16, 16, 3), np.float32) * 0.5
    seq = composite_face_frames(bg, frames, (0, 0, 8, 8))
    assert seq.shape == (3, 64, 64, 3)
    assert seq[0, 0, 0, 0] == 0.5


def test_composite_frames_matches_per_frame_loop():
    """The batched composite (hoisted normalization/copies, optional
    in-place patching) is bit-identical to looping composite_face —
    static bg, per-frame bg, feather, uint8 bg, and edge-clipped bbox."""
    rng = np.random.default_rng(3)
    bg_u8 = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    frames = rng.random((4, 16, 16, 3)).astype(np.float32)
    for bbox in ((10, 20, 12, 9), (-5, 40, 12, 12)):
        for feather in (0, 3):
            got = composite_face_frames(bg_u8, frames, bbox, feather)
            ref = np.stack([composite_face(bg_u8, f, bbox, feather)
                            for f in frames])
            np.testing.assert_array_equal(got, ref)
            # per-frame backgrounds, out-of-place then in-place
            got2 = composite_face_frames(got, frames, (30, 5, 10, 10),
                                         feather)
            ref2 = np.stack([composite_face(got[i], frames[i],
                                            (30, 5, 10, 10), feather)
                             for i in range(4)])
            np.testing.assert_array_equal(got2, ref2)
            inp = got.copy()
            got3 = composite_face_frames(inp, frames, (30, 5, 10, 10),
                                         feather, inplace=True)
            assert got3 is inp                      # patched in place
            np.testing.assert_array_equal(got3, ref2)


def test_composite_mixed_scale_per_frame_bg():
    """A per-frame background stack with MIXED scales (one near-black
    frame among [0,255] frames) normalizes per frame, exactly like the
    composite_face loop (ADVICE r4: the hoisted stack-wide max() decided
    once for all frames)."""
    rng = np.random.default_rng(7)
    bg = (rng.random((3, 40, 40, 3)) * 255).astype(np.float32)
    bg[1] = rng.random((40, 40, 3)).astype(np.float32)   # already [0,1]
    frames = rng.random((3, 16, 16, 3)).astype(np.float32)
    got = composite_face_frames(bg, frames, (8, 8, 12, 12))
    ref = np.stack([composite_face(bg[i], frames[i], (8, 8, 12, 12))
                    for i in range(3)])
    np.testing.assert_array_equal(got, ref)


def test_composite_faces_stream_matches_stacked_path():
    """The streaming two-face compositor (per-frame uint8 generator,
    never holding the (T,H,W,3) f32 stack) is byte-identical to the
    stacked path (composite per face, then quantize) — static and
    per-frame backgrounds, with and without feather, incl. a
    partially-out-of-bounds bbox."""
    from float_tpu.image.composite import composite_faces_stream
    rng = np.random.default_rng(11)
    bg = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    f1 = rng.random((4, 16, 16, 3)).astype(np.float32)
    f2 = rng.random((4, 16, 16, 3)).astype(np.float32)
    for feather in (0, 3):
        for bbox2 in ((30, 5, 10, 10), (-4, 40, 12, 12)):
            faces = [(f1, (6, 8, 12, 12)), (f2, bbox2)]
            stacked = composite_face_frames(bg, f1, faces[0][1], feather)
            stacked = composite_face_frames(stacked, f2, bbox2, feather,
                                            inplace=True)
            ref = (np.clip(stacked, 0, 1) * 255.0 + 0.5).astype(np.uint8)
            got = np.stack(list(composite_faces_stream(bg, faces, feather)))
            np.testing.assert_array_equal(got, ref)
    # per-frame backgrounds
    bg_t = (rng.random((4, 48, 56, 3)) * 255).astype(np.float32)
    faces = [(f1, (6, 8, 12, 12)), (f2, (30, 5, 10, 10))]
    stacked = composite_face_frames(bg_t, f1, faces[0][1])
    stacked = composite_face_frames(stacked, f2, faces[1][1], inplace=True)
    ref = (np.clip(stacked, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    got = np.stack(list(composite_faces_stream(bg_t, faces)))
    np.testing.assert_array_equal(got, ref)


def test_composite_faces_stream_feeds_video_writer(tmp_path):
    """write_video consumes the streaming compositor directly (chunked
    iterator input) — the config-5 sink path."""
    from float_tpu.image.composite import composite_faces_stream
    from float_tpu.io.video import write_video
    rng = np.random.default_rng(2)
    bg = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    f1 = rng.random((5, 16, 16, 3)).astype(np.float32)
    out = str(tmp_path / "insert.mp4")
    write_video(out, composite_faces_stream(bg, [(f1, (4, 4, 12, 12))]),
                fps=25.0)
    import os
    assert os.path.getsize(out) > 500


def test_composite_clips_out_of_bounds():
    bg = np.zeros((32, 32, 3), np.float32)
    face = np.ones((8, 8, 3), np.float32)
    out = composite_face(bg, face, (-4, -4, 16, 16))   # padded-crop bbox
    assert out.shape == (32, 32, 3)
    assert out[0, 0, 0] == 1.0 and out[12, 12, 0] == 0.0


def test_to_model_input_range():
    u8 = np.full((32, 32, 3), 255, np.uint8)
    x = to_model_input(u8, 16)
    assert x.shape == (1, 3, 16, 16)
    np.testing.assert_allclose(x, 1.0)
    np.testing.assert_allclose(to_model_input(np.zeros((16, 16, 3), np.uint8), 16), -1.0)


def test_mono_and_resample():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    stereo = np.stack([tone, tone * 0.5])
    mono = to_mono(stereo)
    np.testing.assert_allclose(mono, tone * 0.75, atol=1e-6)

    res = resample(tone, sr_in, sr_out)
    assert abs(len(res) - sr_out) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(res))
    peak_hz = np.argmax(spec) * sr_out / len(res)
    assert abs(peak_hz - 440) < 2


def test_comfy_audio_dict():
    wf = np.random.randn(1, 2, 32000).astype(np.float32)
    out = comfy_audio_to_mono_16k({"waveform": wf, "sample_rate": 32000})
    assert out.ndim == 1 and abs(len(out) - 16000) <= 1


def test_feature_normalization_matches_hf():
    from transformers import Wav2Vec2FeatureExtractor
    fe = Wav2Vec2FeatureExtractor(do_normalize=True, feature_size=1,
                                  sampling_rate=16000, padding_value=0.0)
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(1000).astype(np.float32) * 0.3,
             rng.standard_normal(800).astype(np.float32) * 2.0]
    got = extract_features(waves)
    ref = fe(waves, sampling_rate=16000, padding=True,
             return_tensors="np").input_values
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    one = normalize_waveform(waves[0])
    ref1 = fe(waves[0], sampling_rate=16000, return_tensors="np").input_values[0]
    np.testing.assert_allclose(one, ref1, rtol=1e-4, atol=1e-5)


def test_face_align_missing_dep_raises():
    """Default detector + no face_alignment package -> ImportError (the
    reference hard-imports it: src/nodes/utils/image.py:9); the degraded
    center-crop is explicit opt-in."""
    import importlib.util
    if importlib.util.find_spec("face_alignment") is not None:
        import pytest
        pytest.skip("face_alignment installed; strict path not reachable")
    img = (np.random.rand(100, 160, 3) * 255).astype(np.uint8)
    import pytest
    with pytest.raises(ImportError):
        face_align_crop(img, 64)
    crop, bbox = face_align_crop(img, 64, allow_fallback=True)
    assert crop.shape == (64, 64, 3)
    assert bbox == (80 - 50, 0, 100, 100)


def test_preprocess_face_align_fallback_mode():
    """face_align='fallback' opts into the center-crop degraded path."""
    from float_tpu.image.transform import comfy_image_to_model_input
    img = np.random.rand(100, 160, 3).astype(np.float32)
    out, bbox = comfy_image_to_model_input(img, 64, face_align="fallback")
    assert out.shape == (1, 3, 64, 64)
    assert bbox is not None
