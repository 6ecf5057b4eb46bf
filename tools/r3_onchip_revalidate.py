#!/usr/bin/env python
"""Round-3 on-chip revalidation runner (run on the real TPU after an
outage or a batch of decode changes).

Each phase runs in its OWN subprocess: the axon remote-compile helper can
crash (HTTP 500) after many large compiles in one process (PERF.md "All
five benchmark configs"), and compile caches are per-process anyway.

Phases:
  1. kernel gate        tools/verify_kernels_on_chip.py --quick
  2. bench              python bench.py  (current defaults)
  3. decode-batch sweep FLOAT_DECODE_BATCH in {16, 20, 24, 28}
  4. batch serving      generate_batch B=4 vs 4x serial generate
  5. stream latency     first-frames wall time for a 10 s clip
  6. packed mid-level   isolated A/B (experiments/packed_midlevel_bench)

Usage: python tools/r3_onchip_revalidate.py [--skip-sweep] [--only N]
Writes a compact report to stdout; paste results into PERF.md.
"""
import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env_extra=None, timeout=3600):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    p = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                       text=True, timeout=timeout)
    dt = time.time() - t0
    return p.returncode, p.stdout.strip(), p.stderr.strip(), dt


BATCH_SNIPPET = r"""
import time
import numpy as np
import jax.numpy as jnp
from float_tpu.config import FloatConfig
from float_tpu.runtime.pipeline import build_synthetic_pipeline

cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
pipe = build_synthetic_pipeline(cfg)
rng = np.random.default_rng(0)
n = 160000
imgs = jnp.asarray(rng.standard_normal((4, 3, 512, 512)).astype(np.float32) * 0.3)
waves = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32) * 0.1)

# warm both paths (ratchets + programs)
outs = pipe.generate_batch(imgs, waves, seeds=[15, 16, 17, 18])
_ = [np.asarray(o[-1]) for o in outs]
f = pipe.generate(imgs[:1], waves[:1], seed=15)
float(jnp.sum(f[0, 0, 0]))

t0 = time.perf_counter()
f = pipe.generate(imgs[:1], waves[:1], seed=15)
float(jnp.sum(f[0, 0, 0]))
one = time.perf_counter() - t0

t0 = time.perf_counter()
outs = pipe.generate_batch(imgs, waves, seeds=[15, 16, 17, 18])
_ = [np.asarray(o[-1, 0, 0]) for o in outs]
four = time.perf_counter() - t0
print(f"BATCH one-clip {one:.3f}s  B=4 {four:.3f}s  ratio {four/one:.2f}x "
      f"(target <= 2.2x)")
"""

STREAM_SNIPPET = r"""
import time
import numpy as np
import jax.numpy as jnp
from float_tpu.config import FloatConfig
from float_tpu.runtime.pipeline import build_synthetic_pipeline

cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
pipe = build_synthetic_pipeline(cfg)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((1, 3, 512, 512)).astype(np.float32) * 0.3)
wave = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32) * 0.1)

# warm every program incl. the uint8 wire (a cold u8 fixup program adds
# ~13 s of compiles to the first yield, PERF.md)
for _ in pipe.generate_stream(img, wave, seed=15):
    pass

t0 = time.perf_counter()
first = None
total = 0
for start, frames in pipe.generate_stream(img, wave, seed=15):
    if first is None:
        first = time.perf_counter() - t0
    total += frames.shape[0]
dt = time.perf_counter() - t0
print(f"STREAM first-frames {first:.3f}s  full clip {dt:.3f}s "
      f"({total/dt:.1f} fps incl. host wire)")
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--only", type=int, default=0, help="run one phase")
    args = ap.parse_args()
    results = []

    def phase(n, name, fn):
        if args.only and args.only != n:
            return
        print(f"== phase {n}: {name}", flush=True)
        rc, out, err, dt = fn()
        tail = "\n".join((out or err).splitlines()[-6:])
        print(tail, flush=True)
        results.append((n, name, rc, dt, tail.splitlines()[-1] if tail else ""))

    phase(1, "kernel gate", lambda: run(
        [sys.executable, "tools/verify_kernels_on_chip.py", "--quick"]))
    phase(2, "bench (defaults)", lambda: run([sys.executable, "bench.py"]))
    if not args.skip_sweep:
        for fb in (16, 20, 28):
            phase(3, f"bench decode_batch={fb}", lambda fb=fb: run(
                [sys.executable, "bench.py"],
                env_extra={"FLOAT_DECODE_BATCH": str(fb)}))
    phase(4, "generate_batch B=4", lambda: run(
        [sys.executable, "-c", BATCH_SNIPPET], timeout=5400))
    phase(5, "stream first-frame latency", lambda: run(
        [sys.executable, "-c", STREAM_SNIPPET], timeout=5400))
    # measure-first idea (PERF.md round-3+): isolated packed 256² mid
    # level — informational, never gates (production is untouched)
    phase(6, "packed mid-level isolated A/B", lambda: run(
        [sys.executable, "experiments/packed_midlevel_bench.py"]))

    print("\n== summary")
    for n, name, rc, dt, last in results:
        print(f"phase {n} {name}: rc={rc} {dt:.0f}s  {last}")
    sys.exit(max((r[2] for r in results), default=0))


if __name__ == "__main__":
    main()
