"""End-to-end pipeline tests on a tiny synthetic config (CPU-runnable)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from float_tpu.config import FloatConfig, Wav2Vec2Config
from float_tpu.runtime.pipeline import (
    FloatPipeline, build_synthetic_pipeline, audio_num_frames, one_hot_emotion,
)

TINY_W2V = Wav2Vec2Config(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, feat_extract_norm="group",
    conv_bias=False, do_stable_layer_norm=False)

TINY_SER = Wav2Vec2Config(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, feat_extract_norm="layer",
    conv_bias=True, do_stable_layer_norm=True, num_labels=7)

TINY = FloatConfig(input_size=64, dim_w=64, dim_a=64, dim_h=64, dim_m=20,
                   dim_e=7, fmt_depth=2, num_heads=4, wav2vec_sec=0.4,
                   num_prev_frames=3, decode_batch=4, compute_dtype="float32")


@pytest.fixture(scope="module")
def pipe():
    return build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)


def test_audio_num_frames():
    cfg = FloatConfig()
    assert audio_num_frames(160000, cfg) == 250      # 10 s @ 25 fps
    assert audio_num_frames(159999, cfg) == 250
    assert audio_num_frames(16000, cfg) == 25


def test_one_hot_emotion():
    we = one_hot_emotion("happy", 7)
    assert we.shape == (1, 1, 7)
    assert float(we[0, 0, 3]) == 1.0                  # happy = index 3


def test_generate_end_to_end(pipe, rng):
    """image + 1 s audio -> 25 frames, [0,1], deterministic per seed."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)

    frames = pipe.generate(img, wave, emotion="happy", seed=15)
    t = audio_num_frames(16000, TINY)
    assert frames.shape == (t, 64, 64, 3)
    f = np.asarray(frames)
    assert np.isfinite(f).all()
    assert f.min() >= 0.0 and f.max() <= 1.0

    again = pipe.generate(img, wave, emotion="happy", seed=15)
    np.testing.assert_array_equal(f, np.asarray(again))

    other = pipe.generate(img, wave, emotion="happy", seed=16)
    assert np.abs(np.asarray(other) - f).max() > 0


def test_generate_predicted_emotion(pipe, rng):
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    scores = pipe.predict_emotion(wave)
    assert scores.shape == (1, 7)
    np.testing.assert_allclose(np.asarray(scores).sum(), 1.0, rtol=1e-5)
    frames = pipe.generate(img, wave, emotion="none", seed=1)
    assert frames.shape == (audio_num_frames(8000, TINY), 64, 64, 3)


def test_stage_api_matches_generate(pipe, rng):
    """Split-stage calls (the Advanced-node path) == one-shot generate."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    t = audio_num_frames(16000, TINY)

    s_r, lam, feats, r_s = pipe.encode_image(img)
    assert s_r.shape == (1, 64) and lam.shape == (1, 20) and r_s.shape == (1, 64)
    wa = pipe.encode_audio(wave, t)
    assert wa.shape == (1, t, 64)
    we = pipe.emotion_latent(wave, "sad")
    r_d = pipe.sample(r_s, wa, we, seed=3)
    assert r_d.shape == (1, t, 64)
    frames = pipe.decode(s_r, feats, r_d)

    ref = pipe.generate(img, wave, emotion="sad", seed=3)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multi_chunk_long_audio(pipe, rng):
    """2.2 s -> 55 frames -> 6 chunks of 10 (clip=10): exercise the scan."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 35200)).astype(np.float32) * 0.1)
    t = audio_num_frames(35200, TINY)
    frames = pipe.generate(img, wave, seed=0, emotion="neutral")
    assert frames.shape == (t, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_dynamic_emotion_sampling(pipe, rng):
    """Per-frame emotion (B, T, E) through the sampler + decode."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    t = audio_num_frames(16000, TINY)
    s_r, _, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we_dyn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((1, t, 7)).astype(np.float32)), -1)
    r_d = pipe.sample(r_s, wa, we_dyn, seed=2)
    assert r_d.shape == (1, t, 64)
    frames = pipe.decode(s_r, feats, r_d)
    assert frames.shape == (t, 64, 64, 3)


def test_streamed_host_decode_matches_device(pipe, rng):
    """uint8-wire streamed decode == device decode within 8-bit quantization."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    t = audio_num_frames(8000, TINY)
    s_r, _, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we = pipe.emotion_latent(None, "happy")
    r_d = pipe.sample(r_s, wa, we, seed=4)

    dev = np.asarray(pipe.decode(s_r, feats, r_d))
    host = pipe.decode_to_host(s_r, feats, r_d)
    assert host.shape == dev.shape and host.dtype == np.float32
    np.testing.assert_allclose(host, dev, atol=1.0 / 255 + 1e-6)

    exact = pipe.decode_to_host(s_r, feats, r_d, uint8_transfer=False)
    np.testing.assert_allclose(exact, dev, atol=1e-6)


def test_generate_with_prepared_source(pipe, rng):
    """source= (prepare_source) skips the per-clip encoder forward and
    produces identical frames; img=None without source raises."""
    import pytest
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)

    ref = pipe.generate(img, wave, emotion="happy", seed=3)
    src = pipe.prepare_source(img)
    got = pipe.generate(None, wave, emotion="happy", seed=3, source=src)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    first = next(iter(pipe.generate_stream(None, wave, emotion="happy",
                                           seed=3, source=src,
                                           uint8_transfer=False)))
    np.testing.assert_allclose(first[1],
                               np.asarray(ref)[:first[1].shape[0]],
                               atol=2e-6)

    with pytest.raises(ValueError):
        pipe.generate(None, wave, emotion="happy")


def test_generate_fps_override(pipe, rng):
    """fps= changes the output frame count (T = ceil(N*fps/sr)) for both
    generate and generate_stream without touching the pipeline config."""
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)

    t_default = audio_num_frames(8000, pipe.cfg)
    t_double = audio_num_frames(8000, pipe.cfg.replace(fps=pipe.cfg.fps * 2))
    assert t_double > t_default

    out = pipe.generate(img, wave, seed=1, fps=pipe.cfg.fps * 2)
    assert out.shape[0] == t_double

    total = sum(f.shape[0] for _s, f in pipe.generate_stream(
        img, wave, seed=1, fps=pipe.cfg.fps * 2, uint8_transfer=False))
    assert total == t_double
    assert pipe.cfg.fps != pipe.cfg.fps * 2   # config untouched
