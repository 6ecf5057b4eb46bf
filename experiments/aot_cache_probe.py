"""Can a compiled TPU executable be serialized and reloaded on the axon
transport?  (PERF.md: the persistent compilation cache is dead across
processes here — keys include per-session remote-compile state.  An AOT
path would let the ~4-min image-encoder compile be paid once.)

Probes jax.experimental.serialize_executable on a small jitted program:
  1. compile, serialize, measure blob size,
  2. deserialize in-process and run (sanity),
  3. write the blob; a SECOND invocation with --load tries to
     deserialize in a fresh process — the cross-process question.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def make_fn():
    def f(x, w):
        for _ in range(8):
            x = jnp.tanh(x @ w)
        return x
    return jax.jit(f)


def main():
    x = jnp.ones((256, 256), jnp.bfloat16)
    w = jnp.ones((256, 256), jnp.bfloat16)
    blob_path = "/tmp/aot_blob.bin"

    if "--load" in sys.argv:
        from jax.experimental import serialize_executable as se
        import pickle
        with open(blob_path, "rb") as fh:
            payload = pickle.load(fh)
        t0 = time.perf_counter()
        try:
            compiled = se.deserialize_and_load(*payload)
            out = compiled(x, w)
            print("LOAD OK:", float(jnp.sum(out.astype(jnp.float32))),
                  f"in {time.perf_counter()-t0:.2f}s (no recompile)")
        except Exception as exc:
            print("LOAD FAILED:", type(exc).__name__, str(exc)[:300])
        return

    fn = make_fn()
    t0 = time.perf_counter()
    lowered = fn.lower(x, w)
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.2f}s")

    from jax.experimental import serialize_executable as se
    import pickle
    try:
        t0 = time.perf_counter()
        payload = se.serialize(compiled)
        blob = pickle.dumps(payload)
        print(f"serialize ok: {len(blob)/1e3:.1f} kB "
              f"in {time.perf_counter()-t0:.2f}s")
        with open(blob_path, "wb") as fh:
            fh.write(blob)
    except Exception as exc:
        print("SERIALIZE FAILED:", type(exc).__name__, str(exc)[:300])
        return

    # in-process deserialize sanity
    try:
        compiled2 = se.deserialize_and_load(*pickle.loads(blob))
        out = compiled2(x, w)
        print("in-process deserialize ok:",
              float(jnp.sum(out.astype(jnp.float32))))
    except Exception as exc:
        print("IN-PROCESS DESERIALIZE FAILED:", type(exc).__name__,
              str(exc)[:300])


if __name__ == "__main__":
    main()
