"""wav2vec2 towers parity vs HuggingFace transformers as oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

import transformers
from transformers import Wav2Vec2Config as HFConfig
from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model

from float_tpu.config import Wav2Vec2Config, FloatConfig
from float_tpu.io.checkpoint import flat_to_pytree
from float_tpu.models.wav2vec2 import (
    feature_extractor, wav2vec2_frame_features, wav2vec2_standard, ser_logits,
)
from float_tpu.models.audio_encoder import encode_audio, pad_wave_to_frames
from float_tpu.models.init import init_audio_projection

SMALL = dict(
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def make_pair(style: str):
    """(HF torch model, our config) for 'base' or 'large' style."""
    if style == "base":
        hf = HFConfig(**SMALL, feat_extract_norm="group", conv_bias=False,
                      do_stable_layer_norm=False)
        ours = Wav2Vec2Config(**SMALL, feat_extract_norm="group",
                              conv_bias=False, do_stable_layer_norm=False)
    else:
        hf = HFConfig(**SMALL, feat_extract_norm="layer", conv_bias=True,
                      do_stable_layer_norm=True)
        ours = Wav2Vec2Config(**SMALL, feat_extract_norm="layer",
                              conv_bias=True, do_stable_layer_norm=True)
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf).eval()
    return model, ours


def to_pytree(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return flat_to_pytree(sd)


@pytest.mark.parametrize("style", ["base", "large"])
def test_feature_extractor_parity(style, rng):
    model, cfg = make_pair(style)
    wave = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model.feature_extractor(torch.as_tensor(wave)).transpose(1, 2)
    params = to_pytree(model)
    got = feature_extractor(params["feature_extractor"], jnp.asarray(wave), cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("style", ["base", "large"])
def test_standard_forward_parity(style, rng):
    model, cfg = make_pair(style)
    wave = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.as_tensor(wave)).last_hidden_state
    params = to_pytree(model)
    got = wav2vec2_standard(params, jnp.asarray(wave), cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_frame_features_parity(rng):
    """Conv features -> frame-grid interpolation -> encoder, all hidden states.

    Oracle composes HF submodules exactly as the reference forward does
    (SURVEY §2.2): feature_extractor -> F.interpolate(align_corners=True)
    -> feature_projection -> encoder(output_hidden_states).
    """
    model, cfg = make_pair("base")
    wave = rng.standard_normal((2, 3200)).astype(np.float32)
    seq_len = 11
    with torch.no_grad():
        feats = model.feature_extractor(torch.as_tensor(wave))          # (B,C,T)
        feats = F.interpolate(feats, size=seq_len, mode="linear",
                              align_corners=True).transpose(1, 2)
        hidden, _ = model.feature_projection(feats)
        enc = model.encoder(hidden, output_hidden_states=True, return_dict=True)
    params = to_pytree(model)
    got = wav2vec2_frame_features(params, jnp.asarray(wave), seq_len, cfg)
    assert len(got.hidden_states) == len(enc.hidden_states)
    np.testing.assert_allclose(np.asarray(got.last_hidden_state),
                               enc.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4)
    for i, (g, r) in enumerate(zip(got.hidden_states, enc.hidden_states)):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"hidden {i}")


def test_ser_classifier_parity(rng):
    """mean-pool + dense/tanh/out_proj head on the large tower."""
    model, cfg = make_pair("large")
    cfg = Wav2Vec2Config(**{**SMALL}, feat_extract_norm="layer", conv_bias=True,
                         do_stable_layer_norm=True, num_labels=7)
    torch.manual_seed(1)
    dense = torch.nn.Linear(32, 32)
    out_proj = torch.nn.Linear(32, 7)
    wave = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        h = model(torch.as_tensor(wave)).last_hidden_state.mean(1)
        ref = out_proj(torch.tanh(dense(h)))
    params = to_pytree(model)
    params["classifier"] = {
        "dense": {"weight": jnp.asarray(dense.weight.detach().numpy()),
                  "bias": jnp.asarray(dense.bias.detach().numpy())},
        "out_proj": {"weight": jnp.asarray(out_proj.weight.detach().numpy()),
                     "bias": jnp.asarray(out_proj.bias.detach().numpy())},
    }
    got = ser_logits(params, jnp.asarray(wave), cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_audio_encoder_end_to_end(rng):
    """Full encode_audio: padding + stacking + projection, shape contract."""
    model, cfg = make_pair("base")
    fcfg = FloatConfig(fps=25.0, sampling_rate=16000, dim_w=24)
    params = {"wav2vec2": to_pytree(model),
              "audio_projection": init_audio_projection(
                  in_dim=cfg.num_hidden_layers * cfg.hidden_size, out_dim=24)}
    n = 16000  # 1 s -> T=25 frames
    wave = rng.standard_normal((1, n)).astype(np.float32)
    t_frames = 25
    wa = encode_audio(params, jnp.asarray(wave), t_frames, fcfg, cfg)
    assert wa.shape == (1, t_frames, 24)
    assert np.isfinite(np.asarray(wa)).all()

    # padding: N not a multiple -> edge-replicated to target
    wave2 = wave[:, :15990]
    padded = pad_wave_to_frames(jnp.asarray(wave2), t_frames, fcfg)
    assert padded.shape == (1, 16000)
    np.testing.assert_allclose(np.asarray(padded[0, 15990:]),
                               np.repeat(wave2[0, -1], 10))


def test_stacked_feature_layout(rng):
    """Stacked (B,T,L*H) layout must be layer-major per frame."""
    model, cfg = make_pair("base")
    params = to_pytree(model)
    wave = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    from float_tpu.models.audio_encoder import stacked_features
    out = wav2vec2_frame_features(params, wave, 7, cfg, collect_hidden=True)
    stacked = stacked_features(params, wave, 7, cfg)
    h = cfg.hidden_size
    for layer in range(cfg.num_hidden_layers):
        np.testing.assert_array_equal(
            np.asarray(stacked[..., layer * h:(layer + 1) * h]),
            np.asarray(out.hidden_states[layer + 1]))


def test_masked_standard_forward_parity(rng):
    """Unequal-length batch with attention mask == HF Wav2Vec2Model given
    the same mask (the xlsr-style SER path: return_attention_mask=true;
    reference passes the extractor mask into the model,
    wav2vec2_ser.py:77-86)."""
    from float_tpu.audio.features import (extract_features,
                                          FeatureExtractorConfig)
    from float_tpu.models.wav2vec2 import feature_vector_attention_mask

    model, cfg = make_pair("large")
    fe = FeatureExtractorConfig(return_attention_mask=True)
    waves = [rng.standard_normal(1600).astype(np.float32),
             rng.standard_normal(1100).astype(np.float32)]
    batch, mask = extract_features(waves, fe, return_mask=True)
    assert mask[0].sum() == 1600 and mask[1].sum() == 1100

    with torch.no_grad():
        ref = model(torch.as_tensor(batch),
                    attention_mask=torch.as_tensor(mask)).last_hidden_state
    params = to_pytree(model)
    got = wav2vec2_standard(params, jnp.asarray(batch), cfg,
                            attention_mask=jnp.asarray(mask))
    # frame mask parity vs HF's own downsampling
    t_conv = got.shape[1]
    hf_mask = model._get_feature_vector_attention_mask(
        t_conv, torch.as_tensor(mask))
    ours_mask = feature_vector_attention_mask(jnp.asarray(mask), t_conv, cfg)
    np.testing.assert_array_equal(np.asarray(ours_mask), hf_mask.numpy())
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_masked_extractor_normalizes_per_item(rng):
    """return_attention_mask=true: each item normalized over its OWN
    samples then padded (HF order); =false: pad first, normalize padded."""
    from float_tpu.audio.features import (extract_features,
                                          FeatureExtractorConfig)
    w = rng.standard_normal(1000).astype(np.float32) * 3 + 1
    masked_fe = FeatureExtractorConfig(return_attention_mask=True)
    batch, mask = extract_features([w, w[:600]], masked_fe, return_mask=True)
    # item 0: plain zero-mean/unit-var over its full length
    np.testing.assert_allclose(batch[0].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(batch[0].std(), 1.0, atol=1e-3)
    # item 1: normalized over its own 600 samples, zero-padded after
    np.testing.assert_allclose(batch[1, :600].mean(), 0.0, atol=1e-5)
    assert (batch[1, 600:] == 0).all()
    assert mask[1, 600:].sum() == 0


def test_ser_logits_masked_vs_reference_module(rng):
    """Full SER classifier on a ragged batch vs the reference's actual
    Wav2Vec2ForSpeechClassification (imported, not copied)."""
    ro = pytest.importorskip("ref_oracle")
    if not ro.HAVE_REFERENCE:
        pytest.skip("reference repo not mounted")
    from pathlib import Path
    from float_tpu.audio.features import (extract_features,
                                          FeatureExtractorConfig)
    ser_mod = ro._load("ref_wav2vec2_ser",
                       Path("/root/reference/src/nodes/models/wav2vec2_ser.py"))

    hf_cfg = HFConfig(**SMALL, feat_extract_norm="layer", conv_bias=True,
                      do_stable_layer_norm=True, num_labels=7)
    hf_cfg.pooling_mode = "mean"
    hf_cfg.final_dropout = 0.0
    torch.manual_seed(1)
    ref_model = ser_mod.Wav2Vec2ForSpeechClassification(hf_cfg).eval()

    ours_cfg = Wav2Vec2Config(**SMALL, feat_extract_norm="layer",
                              conv_bias=True, do_stable_layer_norm=True,
                              num_labels=7)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = flat_to_pytree(sd)
    # the reference nests the tower under 'wav2vec2'
    tower = params["wav2vec2"]
    tower["classifier"] = params["classifier"]

    fe = FeatureExtractorConfig(return_attention_mask=True)
    waves = [rng.standard_normal(1600).astype(np.float32),
             rng.standard_normal(900).astype(np.float32)]
    batch, mask = extract_features(waves, fe, return_mask=True)
    with torch.no_grad():
        ref = ref_model(torch.as_tensor(batch),
                        attention_mask=torch.as_tensor(mask)).logits
    got = ser_logits(tower, jnp.asarray(batch), ours_cfg,
                     attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-4, atol=1e-4)
