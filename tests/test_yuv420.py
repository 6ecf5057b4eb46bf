"""YUV 4:2:0 wire codec + stream wire-format tests.

The jpeg delivery path rides a 4:2:0 device->host wire (half the uint8
bytes); its only losses are uint8 quantization and 2x2 chroma
subsampling — the same losses the downstream JPEG applies anyway.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from float_tpu.ops.yuv420 import rgb01_to_i420, i420_to_rgb_u8

from test_pipeline import TINY, TINY_W2V, TINY_SER


@pytest.fixture(scope="module")
def pipe():
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    return build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)


def test_i420_pack_shape_and_bytes():
    img = jnp.zeros((3, 64, 48, 3), jnp.float32)
    packed = rgb01_to_i420(img)
    assert packed.shape == (3, 96, 48) and packed.dtype == jnp.uint8
    # exactly half the uint8-RGB wire bytes
    assert packed.size * 2 == 3 * 64 * 48 * 3


def test_i420_roundtrip_grayscale_exact_to_quantization():
    """Chroma-flat content (R=G=B) has NO subsampling loss: the
    roundtrip error is pure uint8 quantization (<= 1/255 per channel)."""
    rng = np.random.default_rng(0)
    gray = rng.random((2, 32, 32, 1)).astype(np.float32)
    img = np.repeat(gray, 3, axis=-1)
    got = i420_to_rgb_u8(np.asarray(rgb01_to_i420(jnp.asarray(img))))
    ref = np.round(img * 255.0)
    assert np.abs(got.astype(np.float32) - ref).max() <= 1.0


def test_i420_roundtrip_smooth_color():
    """Smooth chroma gradients survive the 2x2 subsample within a few
    8-bit counts."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)[None]
    got = i420_to_rgb_u8(np.asarray(rgb01_to_i420(jnp.asarray(img))))
    err = np.abs(got.astype(np.float32) - img[0] * 255.0)
    assert err.max() <= 5.0 and err.mean() <= 1.5


def test_i420_single_frame_squeeze():
    img = jnp.full((1, 16, 16, 3), 0.5, jnp.float32)
    packed = np.asarray(rgb01_to_i420(img))[0]          # (24, 16)
    out = i420_to_rgb_u8(packed)
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(np.int32) - 128).max() <= 1


def test_generate_stream_wire_formats_consistent(pipe, rng):
    """wire="u8" yields exactly the uint8 the f32 path was built from;
    wire="yuv420" yields the packed 4:2:0 of those same frames (within
    codec tolerance after host decode); frame counts/starts agree."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64))
                      .astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000))
                       .astype(np.float32) * 0.1)

    def collect(**kw):
        out = list(pipe.generate_stream(img, wave, emotion="happy",
                                        seed=15, **kw))
        starts = [s for s, _ in out]
        return starts, np.concatenate([f for _, f in out], axis=0)

    s_f32, f32 = collect()
    s_u8, u8 = collect(wire="u8")
    s_yuv, yuv = collect(wire="yuv420")
    assert s_f32 == s_u8 == s_yuv
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    # the default f32 emit is u8/255 (uint8_transfer): identical bytes
    np.testing.assert_array_equal(u8, np.round(f32 * 255.0).astype(np.uint8))
    assert yuv.dtype == np.uint8 and yuv.shape == (u8.shape[0], 96, 64)
    rgb = i420_to_rgb_u8(yuv)
    assert rgb.shape == u8.shape
    # synthetic-weight frames are chroma-noisy (worst case for 4:2:0);
    # this is a consistency check — exactness is pinned above
    err = np.abs(rgb.astype(np.float32) - u8.astype(np.float32))
    assert err.mean() <= 8.0, err.mean()
