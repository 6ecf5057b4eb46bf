"""shard_map frame-parallel decode scaling on the virtual CPU mesh.

Measures per-chunk wall time of the sharded decode chunk program vs mesh
size (1/2/4/8 virtual CPU devices) at the tiny 64² config — on one host
this quantifies the shard_map DISPATCH overhead, not real ICI scaling
(every "device" shares the same CPU): the interesting number is how much
per-chunk overhead the mesh mode adds over the single-device program.

Run: python experiments/mesh_decode_scaling.py   (forces CPU platform)
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, "/root/repo")

import jax                                      # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np                              # noqa: E402
import jax.numpy as jnp                         # noqa: E402


def main():
    from jax.sharding import Mesh
    from float_tpu.models.init import init_synthesis, init_encoder
    from float_tpu.models.encoder import encode_image
    from float_tpu.runtime.decode import (_decode_chunk,
                                          make_sharded_chunk_fn)

    size, dim = 64, 64
    fb = 8
    rng = np.random.default_rng(0)
    enc = init_encoder(size, dim, 20, seed=1)
    dec = init_synthesis(size, dim, 20, seed=2)
    x = jnp.asarray(rng.standard_normal((1, 3, size, size)).astype(np.float32))
    h, _, feats = encode_image(enc, x, size, dim)
    feats_c = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats]
    wa = h + jnp.asarray(rng.standard_normal((fb, dim)).astype(np.float32) * 0.1)

    def timeit(fn, n=30):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    base = timeit(lambda: _decode_chunk(dec, wa, feats_c, size,
                                        with_stats=True, fixup=False))
    print(f"single-device chunk ({fb} frames {size}²): {base:.2f} ms")

    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("frames",))
        fn = make_sharded_chunk_fn(mesh)
        t = timeit(lambda: fn(dec, wa, feats_c, size,
                              with_stats=True, fixup=False))
        print(f"mesh {n_dev}-dev chunk: {t:.2f} ms  "
              f"(overhead vs single {t - base:+.2f} ms)")


if __name__ == "__main__":
    main()
