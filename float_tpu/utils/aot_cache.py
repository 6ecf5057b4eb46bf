"""Cross-process AOT executable cache — cold-start elimination.

On standard TPU runtimes JAX's persistent compilation cache already
makes recompiles cheap; on transports whose compile keys include
per-session state (the axon dev tunnel — PERF.md) it never hits across
processes and the full-size image encoder alone recompiles ~4 min per
process.  ``jax.experimental.serialize_executable`` round-trips a
compiled executable through pickle and a FRESH process can
``deserialize_and_load`` and run it with no recompile (verified on this
transport: experiments/aot_cache_probe.py).

This module wraps jitted functions with a disk-backed executable cache:

    aot = AotCache("~/.cache/float_tpu_aot")
    fast_fn = aot.wrap("encode_image", jitted_fn)
    fast_fn(*args, **kwargs)        # compile once per (shapes+statics)
                                    # key ACROSS processes

Keys include arg shapes/dtypes/pytree structure, static kwargs, the jax
version, the device kind, and a host-ISA fingerprint; any load,
deserialize, or first-dispatch failure falls back to the wrapped jitted
function (never worse than no cache).  Blobs are
device-topology-specific by construction — do not ship them across
accelerator generations.  On XLA:CPU, cross-process reuse is known to
fail at dispatch for some programs on this jax version ("Function
..._fusion not found"); the first post-load call is materialized inside
the guard so that case recompiles instead of crashing the pipeline.

The reference's ``first_run`` warm-up accounting (FLOAT.py:33) maps to
XLA compilation; this cache is the TPU-native way to pay it once per
MACHINE instead of once per process.
"""
from __future__ import annotations

import functools
import hashlib
import logging
import os
import pickle
from typing import Any, Callable, Dict

import jax

logger = logging.getLogger("float_tpu.aot")


def _force_sync(out) -> None:
    """Real device sync on a pytree of outputs: a data-dependent scalar
    readback of the first array leaf (``float(jnp.sum(x))`` — the repo's
    standard sync; ``block_until_ready`` is NOT reliable on the axon
    transport).  Reading the reduced scalar forces the producing dispatch
    to complete, so any dispatch-time failure raises here."""
    import jax.numpy as jnp
    import numpy as np
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            np.asarray(jnp.sum(leaf.astype(jnp.float32)))
            return


@functools.lru_cache(maxsize=1)
def _code_fingerprint() -> str:
    """Hash of every float_tpu source file.  Part of the cache key: a
    blob compiled from OLD model code must never be served after a source
    change (deserialize would succeed — the executable is self-contained
    — and silently run stale math)."""
    import float_tpu
    root = os.path.dirname(os.path.abspath(float_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, files in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                h.update(fn.encode())
                with open(os.path.join(dirpath, fn), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=1)
def _host_fingerprint() -> str:
    """CPU-capability fingerprint of THIS host, part of the cache key.
    XLA:CPU AOT blobs are compiled for the build host's exact machine
    features and can SIGILL on a host with fewer (observed: a blob built
    on a wider-ISA host deserializes fine here but XLA logs a
    machine-feature mismatch warning at load).  device_kind is just
    "cpu" for every x86 host, so it cannot distinguish them; TPU blobs
    are already keyed by device_kind and lose nothing."""
    import platform
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def _key_of(name: str, args, kwargs) -> str:
    leaves, treedef = jax.tree.flatten((args, kwargs))
    sig = [name, jax.__version__, jax.devices()[0].device_kind,
           _host_fingerprint(), _code_fingerprint(), str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            sig.append(f"{tuple(leaf.shape)}:{leaf.dtype}")
        else:
            sig.append(repr(leaf))
    return hashlib.sha256("|".join(sig).encode()).hexdigest()[:24]


class AotCache:
    """Disk-backed cache of serialized compiled executables."""

    def __init__(self, cache_dir: str):
        self.dir = os.path.expanduser(cache_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._loaded: Dict[str, Callable] = {}

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key + ".aotx")

    def wrap(self, name: str, jitted_fn: Callable,
             static_argnames=()) -> Callable:
        """Wrap a ``jax.jit``-ted function with the executable cache.

        ``static_argnames`` must name the wrapped jit's static kwargs:
        they are part of the cache key but are BAKED INTO the compiled
        executable, which only accepts the dynamic arguments.
        """
        static_argnames = tuple(static_argnames)

        def runner(compiled):
            def run(*a, **kw):
                dyn = {k: v for k, v in kw.items()
                       if k not in static_argnames}
                return compiled(*a, **dyn)
            return run

        def wrapped(*args, **kwargs):
            key = _key_of(name, args, kwargs)
            hit = self._loaded.get(key)
            if hit is not None:
                return hit(*args, **kwargs)
            path = self._path(key)
            if os.path.exists(path):
                try:
                    from jax.experimental import serialize_executable as se
                    with open(path, "rb") as fh:
                        payload = pickle.load(fh)
                    compiled = se.deserialize_and_load(*payload)
                    run = runner(compiled)
                    # Deserialization succeeding does NOT mean the blob can
                    # execute: XLA:CPU blobs from another process can fail
                    # only at dispatch ("Function ..._fusion not found"),
                    # and dispatch is async — so materialize the first call
                    # HERE, inside the guard, before trusting the blob.
                    # block_until_ready returns EARLY through the axon
                    # tunnel (CLAUDE.md) — force a real sync with a
                    # data-dependent scalar readback on one output leaf so
                    # a dispatch failure surfaces inside this try and falls
                    # back to recompile instead of crashing a later call.
                    out = run(*args, **kwargs)
                    _force_sync(out)
                    self._loaded[key] = run
                    logger.info("aot cache hit: %s (%s)", name, key)
                    return out
                except Exception as exc:      # stale/incompatible blob
                    logger.warning("aot cache load failed for %s (%s); "
                                   "recompiling", name, exc)
                    try:                      # drop it: it will never work
                        os.remove(path)
                    except OSError:
                        pass
            try:
                compiled = jitted_fn.lower(*args, **kwargs).compile()
            except Exception as exc:
                # not lowerable this way (e.g. non-jit callable): bypass
                logger.warning("aot lower failed for %s (%s); running "
                               "uncached", name, exc)
                self._loaded[key] = jitted_fn
                return jitted_fn(*args, **kwargs)
            try:
                from jax.experimental import serialize_executable as se
                payload = se.serialize(compiled)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    pickle.dump(payload, fh)
                os.replace(tmp, path)
                logger.info("aot cache store: %s (%s)", name, key)
            except Exception as exc:
                logger.warning("aot serialize failed for %s (%s); cache "
                               "not persisted", name, exc)

            run = runner(compiled)
            self._loaded[key] = run
            return run(*args, **kwargs)

        return wrapped
