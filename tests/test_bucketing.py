"""Shape-bucketed sampling compilation (VERDICT round-2 item 4).

Bucketing must be EXACT: padded chunks trail the real ones in the
autoregressive scan, so the trimmed result is identical, and clip lengths
within one bucket share a compiled program.
"""
import numpy as np
import jax
import jax.numpy as jnp

from float_tpu.runtime.sampling import bucket_n_chunks, sample_motion_latents
from float_tpu.runtime.pipeline import build_synthetic_pipeline

from test_pipeline import TINY, TINY_W2V, TINY_SER


def test_bucket_schedule():
    assert [bucket_n_chunks(n) for n in range(1, 8)] == [1, 2, 3, 4, 5, 10, 10]
    assert bucket_n_chunks(10) == 10
    assert bucket_n_chunks(11) == 15
    assert bucket_n_chunks(31) == 35


def test_noise_prefix_stable_across_lengths(rng):
    """Per-chunk fold_in noise: a longer clip's sampled prefix matches the
    shorter clip exactly (reference parity: sequential per-chunk randn)."""
    from float_tpu.models.init import init_fmt
    params = init_fmt(TINY, seed=3)
    b = 1
    clip = TINY.num_frames_for_clip
    r_s = jnp.asarray(rng.standard_normal((b, TINY.dim_w)).astype(np.float32))
    t_long = 2 * clip + 3
    wa = jnp.asarray(rng.standard_normal((b, t_long, TINY.dim_a)
                                         ).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, 7)).astype(np.float32))
    key = jax.random.key(7)
    r_long = sample_motion_latents(params, r_s, wa, we, cfg=TINY, key=key,
                                   nfe=3)
    r_short = sample_motion_latents(params, r_s, wa[:, :clip], we, cfg=TINY,
                                    key=key, nfe=3)
    np.testing.assert_allclose(np.asarray(r_long[:, :clip]),
                               np.asarray(r_short), rtol=1e-5, atol=1e-5)


def test_pipeline_sample_bucketing_exact_and_cached(rng):
    pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    clip = TINY.num_frames_for_clip
    b = 1
    r_s = jnp.asarray(rng.standard_normal((b, TINY.dim_w)).astype(np.float32))
    we = jnp.asarray(rng.standard_normal((b, 1, 7)).astype(np.float32))

    # two different T in the same 10-chunk bucket -> ONE compiled program
    wa_a = jnp.asarray(rng.standard_normal((b, 6 * clip + 1, TINY.dim_a)
                                           ).astype(np.float32))
    wa_b = jnp.asarray(rng.standard_normal((b, 9 * clip + 2, TINY.dim_a)
                                           ).astype(np.float32))
    n0 = pipe._sample._cache_size()
    r_a = pipe.sample(r_s, wa_a, we, seed=3)
    n1 = pipe._sample._cache_size()
    r_b = pipe.sample(r_s, wa_b, we, seed=3)
    n2 = pipe._sample._cache_size()
    assert r_a.shape == (b, 6 * clip + 1, TINY.dim_w)
    assert r_b.shape == (b, 9 * clip + 2, TINY.dim_w)
    assert n1 == n0 + 1 and n2 == n1          # second T reused the program

    # bucketed result == prefix of the full-bucket result (exactness)
    wa_full = jnp.pad(wa_a, ((0, 0), (0, 10 * clip - wa_a.shape[1]), (0, 0)),
                      mode="edge")
    r_full = pipe.sample(r_s, wa_full, we, seed=3)
    np.testing.assert_allclose(np.asarray(r_a),
                               np.asarray(r_full[:, :wa_a.shape[1]]),
                               rtol=2e-4, atol=2e-4)
