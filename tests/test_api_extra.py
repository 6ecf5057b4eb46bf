"""VA sampler, 4-way CFG, legacy checkpoint, CLI inspect, version check."""
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from float_tpu.api import nodes as N
from float_tpu.api.types import AudioProjectionLayer, FMTModel, Wav2VecPipe
from float_tpu.config import FloatConfig
from float_tpu.models.init import init_fmt, init_wav2vec2, init_audio_projection

from test_pipeline import TINY, TINY_W2V, TINY_SER

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fmt_model():
    return FMTModel(params=init_fmt(TINY, seed=9), cfg=TINY,
                    construction_options={})


def test_sample_motion_sequence_va(fmt_model, rng):
    b, t = 1, 17
    r_s = jnp.asarray(rng.standard_normal((b, TINY.dim_w)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((b, t, TINY.dim_a)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, 7)).astype(np.float32))
    r_d = N.sample_motion_sequence_va(fmt_model, r_s, wa, we,
                                      a_cfg_scale=2.0, e_cfg_scale=1.5,
                                      nfe=4, ode_method="midpoint", seed=7)
    assert r_d.shape == (b, t, TINY.dim_w)
    # determinism with fix_noise_seed
    r_d2 = N.sample_motion_sequence_va(fmt_model, r_s, wa, we,
                                       a_cfg_scale=2.0, e_cfg_scale=1.5,
                                       nfe=4, ode_method="midpoint", seed=7)
    np.testing.assert_array_equal(np.asarray(r_d), np.asarray(r_d2))


def test_sample_va_include_r_cfg(fmt_model, rng):
    """4-way CFG batch (experimental r_cfg) runs and differs from 3-way."""
    b, t = 1, 10
    r_s = jnp.asarray(rng.standard_normal((b, TINY.dim_w)).astype(np.float32))
    wa = jnp.asarray(rng.standard_normal((b, t, TINY.dim_a)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, 7)).astype(np.float32))
    r3 = N.sample_motion_sequence_va(fmt_model, r_s, wa, we, nfe=3,
                                     a_cfg_scale=2.0, r_cfg_scale=1.5,
                                     include_r_cfg=False, seed=1)
    r4 = N.sample_motion_sequence_va(fmt_model, r_s, wa, we, nfe=3,
                                     a_cfg_scale=2.0, r_cfg_scale=1.5,
                                     include_r_cfg=True, seed=1)
    assert r4.shape == r3.shape
    assert np.abs(np.asarray(r4) - np.asarray(r3)).max() > 1e-6


def test_audio_projection_chain(rng):
    """VA audio chain: wav2vec features -> projection -> wa."""
    w2v_params = init_wav2vec2(TINY_W2V, seed=11)
    pipe = Wav2VecPipe(params=w2v_params, config=TINY_W2V)
    wave = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    feats, processed, t_frames = N.audio_preprocess_and_feature_extract(
        pipe, wave, fps=25.0)
    in_dim = TINY_W2V.num_hidden_layers * TINY_W2V.hidden_size
    assert feats.shape == (1, t_frames, in_dim)
    proj = AudioProjectionLayer(
        params=init_audio_projection(in_dim, TINY.dim_w, seed=12),
        input_dim=in_dim, output_dim=TINY.dim_w)
    wa = N.apply_audio_projection(proj, feats)
    assert wa.shape == (1, t_frames, TINY.dim_w)
    with pytest.raises(ValueError):
        N.apply_audio_projection(proj, feats[..., :8])


def test_extract_emotion_label_path(rng):
    from float_tpu.api.types import EmotionModelPipe
    emo = EmotionModelPipe(params=init_wav2vec2(TINY_SER, seed=13),
                           config=TINY_SER,
                           id2label={0: "angry", 1: "disgust", 2: "fear",
                                     3: "happy", 4: "neutral", 5: "sad",
                                     6: "surprise"})
    we = N.extract_emotion(emo, None, emotion="sad")
    assert float(we[0, 0, 5]) == 1.0
    with pytest.raises(ValueError):
        N.extract_emotion(emo, None, emotion="none")


def test_legacy_pth_checkpoint(tmp_path, rng):
    """Legacy float.pth + HF dirs load path."""
    import torch
    from float_tpu.io.checkpoint import load_legacy_checkpoint
    from float_tpu.models.init import (init_encoder, init_synthesis,
                                       init_fmt, init_audio_projection)
    from safetensors.numpy import save_file
    import json

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            out.update(flatten(v, key) if isinstance(v, dict) else {key: np.asarray(v)})
        return out

    flat = {}
    flat.update(flatten(init_encoder(64, 64, 20), "motion_autoencoder.enc"))
    flat.update(flatten(init_synthesis(64, 64, 20), "motion_autoencoder.dec"))
    flat.update(flatten(init_audio_projection(64, 64), "audio_encoder.audio_projection"))
    flat.update(flatten(init_fmt(TINY), "fmt"))
    pth = tmp_path / "float.pth"
    torch.save({k: torch.as_tensor(v) for k, v in flat.items()}, str(pth))

    # tiny HF dirs
    for name, cfg_extra in [("w2v", {}), ("ser", {"id2label": {str(i): s for i, s in
                            enumerate(["angry", "disgust", "fear", "happy",
                                       "neutral", "sad", "surprise"])}})]:
        d = tmp_path / name
        d.mkdir()
        cfg = {"hidden_size": 32, "num_hidden_layers": 2,
               "num_attention_heads": 4, "intermediate_size": 64,
               "conv_dim": [16, 16, 16], "conv_kernel": [10, 3, 3],
               "conv_stride": [5, 2, 2], "conv_bias": False,
               "feat_extract_norm": "group", "do_stable_layer_norm": False,
               "num_conv_pos_embeddings": 16,
               "num_conv_pos_embedding_groups": 4, **cfg_extra}
        (d / "config.json").write_text(json.dumps(cfg))
        save_file(flatten(init_wav2vec2(TINY_W2V, seed=21)), str(d / "model.safetensors"))

    params = load_legacy_checkpoint(str(pth), str(tmp_path / "w2v"),
                                    str(tmp_path / "ser"))
    assert set(params) == {"encoder", "synthesis", "audio_encoder", "emotion", "fmt"}
    assert params["fmt"]["c_embedder"]["weight"].shape[0] == TINY.dim_h


def test_cli_inspect(tmp_path):
    """CLI inspect on a tiny unified checkpoint."""
    from safetensors.numpy import save_file
    from float_tpu.models.init import init_fmt

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            out.update(flatten(v, key) if isinstance(v, dict) else {key: np.asarray(v)})
        return out

    path = tmp_path / "mini.safetensors"
    save_file(flatten(init_fmt(TINY), "fmt"), str(path))
    r = subprocess.run([sys.executable, "-m", "float_tpu.cli", "inspect",
                        str(path)], capture_output=True, cwd=REPO, text=True)
    assert r.returncode == 0, r.stderr
    assert "fmt" in r.stdout and "tensors" in r.stdout


def test_check_versions_tool():
    r = subprocess.run([sys.executable, "tools/check_versions.py"],
                       capture_output=True, cwd=REPO, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_encode_audio_with_prev(rng):
    from float_tpu.models.audio_encoder import encode_audio_with_prev
    params = {"wav2vec2": init_wav2vec2(TINY_W2V, seed=14),
              "audio_projection": init_audio_projection(
                  TINY_W2V.num_hidden_layers * TINY_W2V.hidden_size,
                  TINY.dim_w, seed=15)}
    clip_samples = int(TINY.num_frames_for_clip * 16000 / 25)
    prev_samples = int(TINY.num_prev_frames * 16000 / 25)
    wave = jnp.asarray(rng.standard_normal((1, clip_samples)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((1, prev_samples)).astype(np.float32))
    wa = encode_audio_with_prev(params, wave, prev, TINY, TINY_W2V)
    assert wa.shape == (1, TINY.num_prev_frames + TINY.num_frames_for_clip,
                        TINY.dim_w)


def test_readiness_check_load_gate(tmp_path):
    """tools/readiness_check.py load gate on a tiny unified checkpoint
    (probe and parity gates skipped: probe needs the full-size config)."""
    import subprocess
    import sys
    import os
    from test_pipeline import TINY, TINY_W2V, TINY_SER
    from test_api import _flatten
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    from safetensors.numpy import save_file

    p = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER).params
    flat = {}
    flat.update(_flatten(p["encoder"], "motion_autoencoder.enc"))
    flat.update(_flatten(p["synthesis"], "motion_autoencoder.dec"))
    flat.update(_flatten(p["audio_encoder"]["wav2vec2"], "audio_encoder.wav2vec2"))
    flat.update(_flatten(p["audio_encoder"]["audio_projection"],
                         "audio_encoder.audio_projection"))
    emo = dict(p["emotion"])
    cls = emo.pop("classifier")
    flat.update(_flatten(emo, "emotion_encoder.wav2vec2_for_emotion.wav2vec2"))
    flat.update(_flatten(cls, "emotion_encoder.wav2vec2_for_emotion.classifier"))
    flat.update(_flatten(p["fmt"], "fmt"))
    path = str(tmp_path / "FLOAT.safetensors")
    save_file(flat, path)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "tools/readiness_check.py", "--checkpoint", path,
         "--skip-probe", "--platform", "cpu"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr
    assert "READY" in res.stdout
    assert "[load] ok" in res.stdout


def test_corrupt_warp_profile_does_not_block_load(tmp_path):
    """A broken warp_profile.json next to the checkpoint is advisory perf
    seeding — loading must log + continue, not raise."""
    import os
    from test_pipeline import TINY, TINY_W2V, TINY_SER
    from test_api import _flatten
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    from float_tpu.api.nodes import load_float_models
    from safetensors.numpy import save_file

    p = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER).params
    flat = {}
    flat.update(_flatten(p["encoder"], "motion_autoencoder.enc"))
    flat.update(_flatten(p["synthesis"], "motion_autoencoder.dec"))
    flat.update(_flatten(p["audio_encoder"]["wav2vec2"], "audio_encoder.wav2vec2"))
    flat.update(_flatten(p["audio_encoder"]["audio_projection"],
                         "audio_encoder.audio_projection"))
    emo = dict(p["emotion"])
    cls = emo.pop("classifier")
    flat.update(_flatten(emo, "emotion_encoder.wav2vec2_for_emotion.wav2vec2"))
    flat.update(_flatten(cls, "emotion_encoder.wav2vec2_for_emotion.classifier"))
    flat.update(_flatten(p["fmt"], "fmt"))
    path = str(tmp_path / "FLOAT.safetensors")
    save_file(flat, path)
    with open(os.path.join(str(tmp_path), "warp_profile.json"), "w") as f:
        f.write("{ truncated garbage")

    pipe = load_float_models(path, cfg=TINY)
    assert pipe.weights == "real"
