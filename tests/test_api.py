"""Node-surface API + checkpoint roundtrip tests (tiny configs)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest
from safetensors.numpy import save_file

from float_tpu.config import FloatConfig
from float_tpu.io import checkpoint as ckpt
from float_tpu.models import init as minit
from float_tpu.api import nodes as N
from float_tpu.api.types import FloatPipe, EmotionModelPipe
from float_tpu.runtime.pipeline import FloatPipeline, build_synthetic_pipeline

from test_pipeline import TINY, TINY_W2V, TINY_SER


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


@pytest.fixture(scope="module")
def pipe():
    p = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    return FloatPipe(p, TINY, weights="synthetic")


@pytest.fixture(scope="module")
def unified_path(tmp_path_factory):
    """Build a unified checkpoint file from tiny synthetic params."""
    d = tmp_path_factory.mktemp("ckpt")
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
    path = str(d / "FLOAT.safetensors")
    save_file(flat, path)
    return path


def test_unified_checkpoint_roundtrip(unified_path):
    params = ckpt.load_unified_checkpoint(unified_path)
    ref = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER).params
    # spot-check leaf equality across components
    np.testing.assert_array_equal(
        np.asarray(params["fmt"]["blocks"]["0"]["attn"]["qkv"]["weight"]),
        np.asarray(ref["fmt"]["blocks"]["0"]["attn"]["qkv"]["weight"]))
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["fc"]["4"]["weight"]),
        np.asarray(ref["encoder"]["fc"]["4"]["weight"]))
    np.testing.assert_array_equal(
        np.asarray(params["emotion"]["classifier"]["dense"]["weight"]),
        np.asarray(ref["emotion"]["classifier"]["dense"]["weight"]))
    # loaded params drive the pipeline
    pl = FloatPipeline(params, TINY, TINY_W2V, TINY_SER)
    img = jnp.zeros((1, 3, 64, 64))
    s_r, lam, feats, r_s = pl.encode_image(img)
    assert s_r.shape == (1, 64) and lam.shape == (1, 20)


def test_part_extraction_and_arch_inference(unified_path, tmp_path):
    from float_tpu.io.download import extract_part
    enc_path = str(tmp_path / "encoder.safetensors")
    dec_path = str(tmp_path / "decoder.safetensors")
    fmt_path = str(tmp_path / "fmt.safetensors")
    proj_path = str(tmp_path / "projection.safetensors")
    for key, path in [("encoder", enc_path), ("decoder", dec_path),
                      ("fmt", fmt_path), ("projection", proj_path)]:
        assert extract_part(unified_path, key, path)

    enc = N.load_float_encoder(enc_path)
    assert (enc.input_size, enc.dim, enc.dim_motion) == (64, 64, 20)
    syn = N.load_float_synthesis(dec_path)
    assert (syn.size, syn.style_dim, syn.motion_dim) == (64, 64, 20)
    fmt = N.load_fmt_model(fmt_path, num_heads=TINY.num_heads,
                           num_prev_frames=TINY.num_prev_frames,
                           wav2vec_sec=TINY.wav2vec_sec)
    assert fmt.cfg.dim_h == 64 and fmt.cfg.fmt_depth == 2
    proj = N.load_audio_projection(proj_path)
    assert proj.output_dim == 64


def test_combine_tool_roundtrip(unified_path, tmp_path):
    """extract parts -> save_combined -> identical unified key set."""
    import subprocess, sys
    out_dir = tmp_path / "parts"
    r = subprocess.run([sys.executable, "tools/extract_parts.py", unified_path,
                        "--all", "-o", str(out_dir)], capture_output=True,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr.decode()
    combined = tmp_path / "combined.safetensors"
    r = subprocess.run(
        [sys.executable, "tools/save_combined.py", "-o", str(combined),
         "--encoder", str(out_dir / "motion_autoencoder/encoder.safetensors"),
         "--decoder", str(out_dir / "motion_autoencoder/decoder.safetensors"),
         "--projection", str(out_dir / "audio_projections/projection.safetensors"),
         "--fmt", str(out_dir / "fmt/fmt.safetensors"),
         "--wav2vec2", str(out_dir / "audio/wav2vec2-base-960h/model.safetensors"),
         "--emotion", str(out_dir / "audio/wav2vec-english-speech-emotion-recognition/model.safetensors")],
        capture_output=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr.decode()
    orig = ckpt.load_safetensors(unified_path)
    rebuilt = ckpt.load_safetensors(str(combined))
    assert set(orig) == set(rebuilt)
    np.testing.assert_array_equal(orig["fmt.c_embedder.weight"],
                                  rebuilt["fmt.c_embedder.weight"])


def test_advanced_node_path(pipe, rng):
    """Advanced split-stage node chain end-to-end."""
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    wave = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1

    app, lam = N.float_encode_image_to_latents(pipe, img)
    assert app.h_source.shape == (1, 64) and len(app.feats) == 4
    r_s = N.float_get_identity_reference(pipe, lam)
    wa, t_frames, processed = N.float_encode_audio_to_wa(pipe, wave, fps=25.0)
    assert wa.shape == (1, t_frames, 64) and t_frames == 25
    we = N.float_encode_emotion_to_we(pipe, processed, "none")
    assert we.shape == (1, 1, 7)
    we2 = N.float_encode_emotion_to_we(pipe, None, "happy")
    assert float(we2[0, 0, 3]) == 1.0
    r_d = N.float_sample_motion_sequence(pipe, r_s, wa, we, seed=1)
    assert r_d.shape == (1, t_frames, 64)
    frames, fps = N.float_decode_latents_to_images(pipe, app, r_d)
    assert frames.shape == (t_frames, 64, 64, 3) and fps == 25.0


def test_dynamic_emotion_node(pipe, rng):
    wave = rng.standard_normal((1, 24000)).astype(np.float32) * 0.1
    emo_pipe = EmotionModelPipe(params=pipe.pipeline.params["emotion"],
                                config=TINY_SER)
    we, seq = N.extract_emotion_dynamic(emo_pipe, wave, total_video_frames=38,
                                        chunk_duration_sec=0.5)
    assert we.shape == (1, 38, 7)
    assert seq.shape[1] == 3                # ceil(1.5s / 0.5s)
    np.testing.assert_allclose(np.asarray(we).sum(-1), 1.0, rtol=1e-4)


def test_va_apply_nodes(pipe, rng, unified_path, tmp_path):
    """VA loaders + apply chain (standalone components)."""
    from float_tpu.io.download import extract_part
    enc_path = str(tmp_path / "enc.safetensors")
    dec_path = str(tmp_path / "dec.safetensors")
    extract_part(unified_path, "encoder", enc_path)
    extract_part(unified_path, "decoder", dec_path)
    enc = N.load_float_encoder(enc_path)
    syn = N.load_float_synthesis(dec_path)

    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    app, lam = N.apply_float_encoder(enc, img)
    r_s = N.get_identity_reference_va(syn, lam)
    assert r_s.shape == (1, 64)
    r_d = jnp.asarray(rng.standard_normal((1, 4, 64)).astype(np.float32) * 0.1)
    frames, fps = N.apply_float_synthesis(syn, app, r_d, decode_batch=2)
    assert frames.shape == (4, 64, 64, 3)


def test_float_process_batch_broadcast(pipe, rng):
    """max(B_img, B_aud) pairing with last-element repeat + seed+i."""
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
    wave = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    frames, audio, fps = N.float_process(imgs, wave, pipe, seed=5)
    t = 13   # ceil(8000*25/16000)
    assert frames.shape == (2 * t, 64, 64, 3)


def test_adv_options_flow():
    adv = N.float_advanced_parameters(nfe=5, torchdiffeq_ode_method="midpoint",
                                      r_cfg_scale=1.2)
    from float_tpu.config import apply_adv_options
    cfg = apply_adv_options(FloatConfig(), adv)
    assert cfg.nfe == 5 and cfg.ode_method == "midpoint" and cfg.r_cfg_scale == 1.2
    with pytest.raises(KeyError):
        apply_adv_options(FloatConfig(), {"bogus": 1})
