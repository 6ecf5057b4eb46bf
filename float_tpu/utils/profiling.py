"""Step timing + progress instrumentation.

TPU-native replacement for the reference's ProgressBar/tqdm/first_run
accounting (SURVEY §5.1): stage timers with proper device synchronization,
a progress-callback protocol the runtime hooks into, and optional JAX
profiler traces.

Note on timing: through remote device transports ``block_until_ready`` can
return before execution completes; ``device_sync`` forces a scalar
reduction + 4-byte readback, which is the reliable sync.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


def device_sync(x) -> None:
    """Force completion of everything producing ``x`` (pytree ok)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


@dataclass
class StageTimes:
    times: Dict[str, List[float]] = field(default_factory=dict)

    def add(self, name: str, dt: float):
        self.times.setdefault(name, []).append(dt)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items()}

    def report(self) -> str:
        return "\n".join(f"{k}: {v*1000:.1f} ms"
                         for k, v in self.summary().items())


class Profiler:
    """Collects per-stage wall times; optionally wraps jax.profiler."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.stages = StageTimes()
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            device_sync(sync_on)
        self.stages.add(name, time.perf_counter() - t0)

    @contextlib.contextmanager
    def trace(self):
        if self.trace_dir:
            with jax.profiler.trace(self.trace_dir):
                yield
        else:
            yield


class ProgressCallback:
    """Progress protocol: total units, per-unit update — the ComfyUI
    ProgressBar contract without the UI."""

    def __init__(self, total: int, on_update: Optional[Callable] = None):
        self.total = total
        self.done = 0
        self.on_update = on_update

    def update(self, n: int = 1):
        self.done += n
        if self.on_update:
            self.on_update(self.done, self.total)
