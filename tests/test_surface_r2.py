"""Round-2 surface parity: preprocessor_config honoring, used-audio
concat, model-store discovery, synthetic opt-in, CLI image loading,
wav2vec2 split stages, blur-kernel string parsing."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from float_tpu.api import nodes as N
from float_tpu.api.types import FloatPipe, Wav2VecPipe
from float_tpu.audio.features import (DEFAULT_FE, FeatureExtractorConfig,
                                      extract_features,
                                      load_preprocessor_config,
                                      normalize_waveform)
from float_tpu.runtime.pipeline import build_synthetic_pipeline

from test_pipeline import TINY, TINY_W2V, TINY_SER


@pytest.fixture(scope="module")
def float_pipe():
    return FloatPipe(build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER),
                     TINY, weights="synthetic")


# ---------------------------------------------------------------------------
# preprocessor_config.json (reference: generate.py:42-67)
# ---------------------------------------------------------------------------

def test_load_preprocessor_config(tmp_path):
    d = tmp_path / "w2v"
    d.mkdir()
    (d / "preprocessor_config.json").write_text(json.dumps({
        "do_normalize": False, "padding_value": 0.5,
        "sampling_rate": 8000, "return_attention_mask": True}))
    fe = load_preprocessor_config(str(d))
    assert fe.do_normalize is False
    assert fe.padding_value == 0.5
    assert fe.sampling_rate == 8000
    with pytest.raises(FileNotFoundError):
        load_preprocessor_config(str(tmp_path / "missing"))


def test_do_normalize_false_passes_through(rng):
    wave = rng.standard_normal(1000).astype(np.float32) + 3.0
    fe_off = FeatureExtractorConfig(do_normalize=False)
    np.testing.assert_array_equal(normalize_waveform(wave, fe_off), wave)
    batch = extract_features([wave], fe_off)
    np.testing.assert_array_equal(batch[0], wave)
    # default config normalizes
    norm = extract_features([wave])
    assert abs(norm.mean()) < 1e-4 and abs(norm.std() - 1.0) < 1e-3


def test_padding_value_used_when_unnormalized(rng):
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(60).astype(np.float32)
    fe = FeatureExtractorConfig(do_normalize=False, padding_value=-7.0)
    batch = extract_features([a, b], fe)
    assert batch.shape == (2, 100)
    np.testing.assert_array_equal(batch[1, 60:], np.full(40, -7.0, np.float32))


def test_load_wav2vec_model_reads_dir_fe(tmp_path):
    """LoadWav2VecModel picks up the model dir's own preprocessor config
    (reference: nodes_vadv_loader.py:139)."""
    from safetensors.numpy import save_file
    from float_tpu.models.init import init_wav2vec2

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            out.update(flatten(v, key) if isinstance(v, dict)
                       else {key: np.asarray(v)})
        return out

    d = tmp_path / "w2v"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
        "intermediate_size": 64, "conv_dim": [16, 16, 16],
        "conv_kernel": [10, 3, 3], "conv_stride": [5, 2, 2],
        "conv_bias": False, "feat_extract_norm": "group",
        "do_stable_layer_norm": False, "num_conv_pos_embeddings": 16,
        "num_conv_pos_embedding_groups": 4}))
    save_file(flatten(init_wav2vec2(TINY_W2V, seed=3)),
              str(d / "model.safetensors"))
    (d / "preprocessor_config.json").write_text(json.dumps({
        "do_normalize": False, "sampling_rate": 16000}))
    pipe = N.load_wav2vec_model(str(d))
    assert pipe.fe.do_normalize is False
    assert pipe.expected_sr == 16000

    # a do_normalize=false config changes the extracted features
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(8000).astype(np.float32) * 0.1 + 0.5)[None]
    feats_off, _, _ = N.audio_preprocess_and_feature_extract(pipe, wave)
    pipe_on = Wav2VecPipe(params=pipe.params, config=pipe.config,
                          fe=DEFAULT_FE)
    feats_on, _, _ = N.audio_preprocess_and_feature_extract(pipe_on, wave)
    assert not np.allclose(np.asarray(feats_off), np.asarray(feats_on))


# ---------------------------------------------------------------------------
# float_process used-audio concat (reference: nodes.py:213-222)
# ---------------------------------------------------------------------------

def test_float_process_batch_concat_audio(float_pipe, rng):
    img = rng.uniform(0, 1, (1, TINY.input_size, TINY.input_size, 3)
                      ).astype(np.float32)
    n1, n2 = 3200, 4800
    wf = np.zeros((2, 1, n2), np.float32)
    wf[0, 0, :n1] = rng.standard_normal(n1).astype(np.float32) * 0.1
    wf[1, 0] = rng.standard_normal(n2).astype(np.float32) * 0.1
    audio = {"waveform": wf, "sample_rate": 16000}
    frames, out_audio, fps = N.float_process(
        img, audio, float_pipe, emotion="happy", fps=25.0, seed=1)
    assert isinstance(out_audio, dict)
    assert out_audio["waveform"].shape == (1, 1, 2 * n2)
    np.testing.assert_array_equal(out_audio["waveform"][0, 0, :n2], wf[0, 0])
    np.testing.assert_array_equal(out_audio["waveform"][0, 0, n2:], wf[1, 0])
    assert out_audio["sample_rate"] == 16000
    t1 = int(np.ceil(n2 * 25.0 / 16000))
    assert frames.shape[0] == 2 * t1


def test_float_process_single_item_passthrough(float_pipe, rng):
    img = rng.uniform(0, 1, (1, TINY.input_size, TINY.input_size, 3)
                      ).astype(np.float32)
    audio = {"waveform": np.zeros((1, 1, 3200), np.float32),
             "sample_rate": 16000}
    _, out_audio, _ = N.float_process(img, audio, float_pipe,
                                      emotion="happy", seed=1)
    assert out_audio is audio


# ---------------------------------------------------------------------------
# model store: discovery + synthetic opt-in
# ---------------------------------------------------------------------------

def test_load_float_models_raises_without_checkpoint(tmp_path):
    with pytest.raises(FileNotFoundError):
        N.load_float_models("FLOAT.safetensors",
                            models_root=str(tmp_path / "models"))


def test_load_float_models_synthetic_opt_in(tmp_path):
    pipe = N.load_float_models("FLOAT.safetensors",
                               models_root=str(tmp_path / "models"),
                               cfg=TINY, allow_synthetic=True)
    assert pipe.weights == "synthetic"


def test_checkpoint_path_resolution(tmp_path):
    from float_tpu.api.nodes import _resolve_checkpoint_path
    root = str(tmp_path / "models")
    assert (_resolve_checkpoint_path("FLOAT.safetensors", root)
            == os.path.join(root, "float", "FLOAT.safetensors"))
    explicit = tmp_path / "elsewhere.safetensors"
    explicit.write_bytes(b"")
    assert _resolve_checkpoint_path(str(explicit), root) == str(explicit)


def test_look_for_models(tmp_path):
    from float_tpu.io.download import look_for_models, look_for_model_dirs
    root = str(tmp_path)
    fdir = tmp_path / "float"
    fdir.mkdir()
    (fdir / "b.safetensors").write_bytes(b"")
    (fdir / "a.safetensors").write_bytes(b"")
    (fdir / "notes.txt").write_bytes(b"")
    got = look_for_models(root, "float", "FLOAT.safetensors")
    assert got == ["FLOAT.safetensors", "a.safetensors", "b.safetensors"]

    hf = fdir / "some-hf-model"
    hf.mkdir()
    (hf / "config.json").write_text("{}")
    (hf / "model.safetensors").write_bytes(b"")
    (fdir / "not-a-model").mkdir()
    dirs = look_for_model_dirs(root, "float", "default-dir")
    assert dirs == ["default-dir", "some-hf-model"]


# ---------------------------------------------------------------------------
# blur-kernel string parsing (reference: nodes_vadv_loader.py:37-57)
# ---------------------------------------------------------------------------

def test_safe_parse_list_str():
    assert N.safe_parse_list_str("[1, 3, 3, 1]") == [1, 3, 3, 1]
    with pytest.raises(ValueError):
        N.safe_parse_list_str("(1, 2)")
    with pytest.raises(ValueError):
        N.safe_parse_list_str("[1, 'a']")
    with pytest.raises(ValueError):
        N.safe_parse_list_str("__import__('os')")


# ---------------------------------------------------------------------------
# CLI image loading (RGBA / npy / grayscale)
# ---------------------------------------------------------------------------

def test_cli_load_image_file(tmp_path, rng):
    import cv2
    from float_tpu.cli import load_image_file
    # 4-channel PNG keeps alpha and converts BGRA->RGBA
    rgba = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
    p4 = str(tmp_path / "rgba.png")
    cv2.imwrite(p4, cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))
    out = load_image_file(p4)
    assert out.shape == (16, 16, 4)
    np.testing.assert_allclose(out, rgba.astype(np.float32) / 255.0,
                               atol=1e-6)
    # 3-channel
    rgb = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    p3 = str(tmp_path / "rgb.png")
    cv2.imwrite(p3, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    np.testing.assert_allclose(load_image_file(p3),
                               rgb.astype(np.float32) / 255.0, atol=1e-6)
    # .npy (uint8 range auto-scales)
    pn = str(tmp_path / "img.npy")
    np.save(pn, rgb)
    got = load_image_file(pn)
    assert got.max() <= 1.0 and got.shape == (16, 16, 3)
    # missing file raises
    with pytest.raises(FileNotFoundError):
        load_image_file(str(tmp_path / "nope.png"))


# ---------------------------------------------------------------------------
# wav2vec2 split stages (reference: wav2vec2.py:100-181)
# ---------------------------------------------------------------------------

def test_wav2vec2_split_stages_match_forward(rng):
    from float_tpu.models.init import init_wav2vec2
    from float_tpu.models.wav2vec2 import (encode, feature_extract,
                                           wav2vec2_frame_features)
    params = init_wav2vec2(TINY_W2V, seed=5)
    wave = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    seq_len = 10
    feats = feature_extract(params, wave, seq_len, TINY_W2V)
    assert feats.shape == (1, seq_len, TINY_W2V.conv_dim[-1])
    out_split = encode(params, feats, TINY_W2V)
    out_full = wav2vec2_frame_features(params, wave, seq_len, TINY_W2V)
    np.testing.assert_allclose(np.asarray(out_split.last_hidden_state),
                               np.asarray(out_full.last_hidden_state),
                               rtol=1e-6, atol=1e-6)
    assert len(out_split.hidden_states) == TINY_W2V.num_hidden_layers + 1


def test_node_input_validation(float_pipe):
    """Reference-style batch/shape validation on the Advanced node surface
    (reference: nodes_adv.py:262-274, 727-742, 855-872)."""
    import numpy as np
    import pytest
    import jax.numpy as jnp
    from float_tpu.api import nodes as N

    pipe = float_pipe
    cfg = pipe.cfg

    with pytest.raises(ValueError, match="channels"):
        N.float_encode_image_to_latents(
            pipe, np.zeros((1, cfg.input_size, cfg.input_size, 4), np.float32))
    with pytest.raises(ValueError, match="B, H, W, C"):
        N.float_encode_image_to_latents(pipe, np.zeros((2, 2), np.float32))

    r_s = jnp.zeros((1, cfg.dim_w))
    wa = jnp.zeros((2, 10, cfg.dim_w))
    we = jnp.zeros((2, 1, cfg.dim_e))
    with pytest.raises(ValueError, match="batch size mismatch"):
        N.float_sample_motion_sequence(pipe, r_s, wa, we)

    app, _lam = N.float_encode_image_to_latents(
        pipe, np.zeros((1, cfg.input_size, cfg.input_size, 3), np.float32))
    with pytest.raises(ValueError, match="batch mismatch"):
        N.float_decode_latents_to_images(
            pipe, app, jnp.zeros((3, 4, cfg.dim_w)))
