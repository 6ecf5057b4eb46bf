"""Remainder-chunk bucketing (decode pays a 4-frame bucket, not a full
decode_batch, for the trailing partial chunk)."""
import numpy as np
import jax.numpy as jnp

from float_tpu.runtime.decode import _chunk_sizes, decode_latents
from float_tpu.runtime import decode as D


def test_chunk_sizes():
    assert _chunk_sizes(250, 16, True) == [16] * 15 + [12]
    assert _chunk_sizes(250, 16, False) == [16] * 16
    assert _chunk_sizes(240, 16, True) == [16] * 15
    assert _chunk_sizes(3, 16, True) == [4]
    assert _chunk_sizes(10, 8, True) == [8, 4]
    assert _chunk_sizes(0, 8, True) == []
    assert sum(_chunk_sizes(17, 16, True)) >= 17


def test_bucketed_decode_matches_full(rng):
    """decode_latents with a bucketed trailing chunk == unchunked
    synthesis on every frame."""
    from float_tpu.models.init import init_synthesis, init_encoder
    from float_tpu.models.encoder import encode_image
    from float_tpu.models.synthesis import synthesis_cl

    enc = init_encoder(32, 16, 10, seed=1)
    dec = init_synthesis(32, 16, 10, seed=2)
    x = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    h, _, feats = encode_image(enc, x, 32, 16)
    t = 10                                   # fb=8 -> sizes [8, 4]
    r_d = jnp.asarray(rng.standard_normal((t, 16)).astype(np.float32) * 0.1)

    D._DISP_RATCHET.pop(32, None)
    D._PATH_RATCHET.pop(32, None)
    got = decode_latents(dec, h, feats, r_d, size=32, decode_batch=8)

    wa = h + r_d
    feats_cl = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]
    ref, _ = synthesis_cl(dec, wa, feats_cl, 32)
    ref = (jnp.clip(ref, -1.0, 1.0) + 1.0) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
