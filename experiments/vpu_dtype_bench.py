"""Measure VPU elementwise-FMA throughput in f32 vs bf16 inside Pallas.

Decides whether the warp kernel's tap arithmetic should run in bf16:
if the VPU does packed bf16 (2 lanes/ALU), the tap-sum chain halves.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_OPS = 64
TILES = 256


def make(dtype, acc_dtype):
    def kern(x_ref, o_ref):
        x = x_ref[:].astype(acc_dtype)
        acc = x
        for i in range(N_OPS):
            acc = acc + x * acc_dtype(0.5 + i * 1e-3)
        o_ref[:] = acc.astype(dtype)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((1, 8, 128, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128, 128), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((TILES, 8, 128, 128), dtype),
        )(x)
    return run


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(name, dtype, acc_dtype):
    run = make(dtype, acc_dtype)
    x = jnp.ones((TILES, 8, 128, 128), dtype)
    sync(run(x))                      # compile + warm
    n = 20
    t0 = time.perf_counter()
    y = None
    for _ in range(n):
        y = run(x)
    sync(y)
    dt = (time.perf_counter() - t0) / n
    elems = TILES * 8 * 128 * 128 * N_OPS
    print(f"{name}: {dt*1e3:.2f} ms  ({elems/dt/1e12:.2f} T fma-elems/s)")
    return dt


if __name__ == "__main__":
    a = bench("f32  in, f32 acc", jnp.float32, jnp.float32)
    b = bench("bf16 in, f32 acc", jnp.bfloat16, jnp.float32)
    c = bench("bf16 in, bf16 acc", jnp.bfloat16, jnp.bfloat16)
    print(f"bf16-acc speedup vs f32-acc: {a/c:.2f}x; vs bf16-in/f32-acc: {b/c:.2f}x")
