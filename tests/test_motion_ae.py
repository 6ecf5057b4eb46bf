"""Motion autoencoder parity vs the actual reference implementation."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from float_tpu.models.encoder import encode_image, encoder_app, encoder_fc
from float_tpu.models.synthesis import direction, synthesis

from ref_oracle import HAVE_REFERENCE, load_reference_models, torch_state_to_pytree

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")

SIZE = 64   # small config: pyramid 64->1, 4 res blocks, 4 synthesis levels
DIM = 512
DIM_M = 20


@pytest.fixture(scope="module")
def ref_encoder():
    enc_mod, _ = load_reference_models()
    torch.manual_seed(0)
    m = enc_mod.Encoder(SIZE, DIM, DIM_M).eval()
    return m


@pytest.fixture(scope="module")
def ref_synthesis():
    _, dec_mod = load_reference_models()
    torch.manual_seed(1)
    m = dec_mod.Synthesis(SIZE, DIM, DIM_M).eval()
    return m


def test_encoder_parity(ref_encoder, rng):
    x = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        h_ref, _, feats_ref = ref_encoder(torch.as_tensor(x), None)
        lam_ref = ref_encoder.fc(h_ref)

    params = torch_state_to_pytree(ref_encoder.state_dict())
    h, lam, feats = encode_image(params, jnp.asarray(x), SIZE, DIM)

    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lam), lam_ref.numpy(), rtol=1e-4, atol=1e-4)
    assert len(feats) == len(feats_ref)
    for i, (f, fr) in enumerate(zip(feats, feats_ref)):
        assert f.shape == tuple(fr.shape), (i, f.shape, fr.shape)
        np.testing.assert_allclose(np.asarray(f), fr.numpy(), rtol=1e-4, atol=1e-4,
                                   err_msg=f"feat {i}")


def test_direction_parity(ref_synthesis, rng):
    alpha = rng.standard_normal((3, DIM_M)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_synthesis.direction(torch.as_tensor(alpha))
    params = torch_state_to_pytree(ref_synthesis.state_dict())
    out = direction(params["direction"], jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-3, atol=1e-4)


def test_synthesis_parity(ref_encoder, ref_synthesis, rng):
    """Full image -> latent -> image round trip vs reference."""
    x = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    wa_off = rng.standard_normal((2, DIM)).astype(np.float32) * 0.1

    with torch.no_grad():
        h_ref, _, feats_ref = ref_encoder(torch.as_tensor(x), None)
        wa_t = h_ref + torch.as_tensor(wa_off)
        img_ref, flow_ref = ref_synthesis(wa_t, alpha=None, feats=feats_ref)

    enc_params = torch_state_to_pytree(ref_encoder.state_dict())
    dec_params = torch_state_to_pytree(ref_synthesis.state_dict())
    h, _, feats = encode_image(enc_params, jnp.asarray(x), SIZE, DIM)
    img, flow = synthesis(dec_params, h + jnp.asarray(wa_off), feats, SIZE)

    assert img.shape == tuple(img_ref.shape)
    np.testing.assert_allclose(np.asarray(img), img_ref.numpy(), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(flow), flow_ref.numpy(), rtol=1e-3, atol=1e-3)


def test_synthesis_frame_batching(ref_encoder, ref_synthesis, rng):
    """Decoding F frames in one batched call == F single-frame calls.

    This validates the TPU-first frame-batched decode design against the
    reference's frame-by-frame loop (FLOAT.py:113-169).
    """
    x = rng.standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    enc_params = torch_state_to_pytree(ref_encoder.state_dict())
    dec_params = torch_state_to_pytree(ref_synthesis.state_dict())
    h, _, feats = encode_image(enc_params, jnp.asarray(x), SIZE, DIM)

    n_frames = 3
    r_d = rng.standard_normal((n_frames, DIM)).astype(np.float32) * 0.1
    wa_frames = h + jnp.asarray(r_d)             # (F, DIM) broadcast h (1, DIM)

    batched, _ = synthesis(dec_params, wa_frames, feats, SIZE)
    for t in range(n_frames):
        single, _ = synthesis(dec_params, wa_frames[t:t + 1],
                              [f for f in feats], SIZE)
        np.testing.assert_allclose(np.asarray(batched[t]), np.asarray(single[0]),
                                   rtol=1e-3, atol=1e-3, err_msg=f"frame {t}")


def test_synthesis_alpha_paths(ref_encoder, ref_synthesis, rng):
    """alpha conditioning branches (single + motion-transfer triple)."""
    x = rng.standard_normal((2, 3, SIZE, SIZE)).astype(np.float32)
    alphas = [rng.standard_normal((2, DIM_M)).astype(np.float32) * 0.3
              for _ in range(3)]

    with torch.no_grad():
        h_ref, _, feats_ref = ref_encoder(torch.as_tensor(x), None)
        img1_ref, _ = ref_synthesis(h_ref, [torch.as_tensor(alphas[0])], feats_ref)
        img3_ref, _ = ref_synthesis(
            h_ref, [torch.as_tensor(a) for a in alphas], feats_ref)

    enc_params = torch_state_to_pytree(ref_encoder.state_dict())
    dec_params = torch_state_to_pytree(ref_synthesis.state_dict())
    h, _, feats = encode_image(enc_params, jnp.asarray(x), SIZE, DIM)

    img1, _ = synthesis(dec_params, h, feats, SIZE,
                        alpha=[jnp.asarray(alphas[0])])
    np.testing.assert_allclose(np.asarray(img1), img1_ref.numpy(),
                               rtol=1e-3, atol=5e-3)
    img3, _ = synthesis(dec_params, h, feats, SIZE,
                        alpha=[jnp.asarray(a) for a in alphas])
    np.testing.assert_allclose(np.asarray(img3), img3_ref.numpy(),
                               rtol=1e-3, atol=5e-3)


def test_synthesis_channels_last_parity(ref_encoder, ref_synthesis, rng):
    """NHWC decode path == NCHW path (and hence == reference)."""
    from float_tpu.models.synthesis import synthesis_cl
    x = rng.standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    enc_params = torch_state_to_pytree(ref_encoder.state_dict())
    dec_params = torch_state_to_pytree(ref_synthesis.state_dict())
    h, _, feats = encode_image(enc_params, jnp.asarray(x), SIZE, DIM)
    wa = h + jnp.asarray(rng.standard_normal((4, DIM)).astype(np.float32) * 0.1)

    img_nchw, flow_nchw = synthesis(dec_params, wa, feats, SIZE)
    feats_cl = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]
    img_cl, flow_cl = synthesis_cl(dec_params, wa, feats_cl, SIZE)

    assert img_cl.shape == (4, SIZE, SIZE, 3)
    np.testing.assert_allclose(np.asarray(img_cl),
                               np.transpose(np.asarray(img_nchw), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(flow_cl), np.asarray(flow_nchw),
                               rtol=1e-4, atol=1e-5)
