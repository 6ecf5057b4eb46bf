"""Does a deserialize_and_load-ed executable DISPATCH as fast as the
fresh-compiled one?  (r5: the first bench.py run on a pre-populated
.aot_cache read 22 fps vs the 433-450 headline — every earlier headline
run POPULATED the cache, so loaded-blob steady-state dispatch had never
been e2e-measured.  The r3 probe only proved "runs with no recompile".)

Times N synced dispatches of a conv-heavy chunk-sized program:
  arm A: fresh .lower().compile()
  arm B: se.deserialize_and_load(se.serialize(compiled_A))
  arm C: pickle round-trip through disk, fresh deserialize (the actual
         AotCache path)
Same process, same inputs; sync = data-dependent scalar readback
(CLAUDE.md: block_until_ready returns early through the tunnel).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def make_fn():
    # conv-heavy body roughly shaped like a decode-chunk level
    def f(x, w1, w2):
        for _ in range(4):
            x = jax.lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(x, 0.2 * x)
            x = jax.lax.conv_general_dilated(
                x, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x
    return jax.jit(f)


def timed(run, args, reps=20):
    out = run(*args)
    float(jnp.sum(out.astype(jnp.float32)))          # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(*args)
    float(jnp.sum(out.astype(jnp.float32)))          # one trailing sync
    return (time.perf_counter() - t0) / reps * 1e3   # ms/dispatch


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (24, 128, 128, 64), jnp.bfloat16)
    w1 = 0.1 * jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16)
    w2 = 0.1 * jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16)
    args = (x, w1, w2)

    fn = make_fn()
    t0 = time.perf_counter()
    compiled = fn.lower(*args).compile()
    print(f"compile {time.perf_counter()-t0:.1f}s")
    ms_fresh = timed(compiled, args)
    print(f"A fresh-compiled:      {ms_fresh:7.2f} ms/dispatch")

    from jax.experimental import serialize_executable as se
    import pickle
    payload = se.serialize(compiled)
    blob = pickle.dumps(payload)
    print(f"blob {len(blob)/1e6:.1f} MB")

    loaded = se.deserialize_and_load(*payload)
    ms_loaded = timed(loaded, args)
    print(f"B deserialized (mem):  {ms_loaded:7.2f} ms/dispatch")

    payload2 = pickle.loads(blob)
    loaded2 = se.deserialize_and_load(*payload2)
    ms_disk = timed(loaded2, args)
    print(f"C deserialized (disk): {ms_disk:7.2f} ms/dispatch")

    print(f"ratio B/A {ms_loaded/ms_fresh:.2f}  C/A {ms_disk/ms_fresh:.2f}")


if __name__ == "__main__":
    main()
