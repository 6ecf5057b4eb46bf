"""Persistent XLA compilation cache setup.

The reference's "first run is warm-up" (FLOAT.py:33) maps to XLA
compilation; enabling JAX's persistent cache makes that a one-time cost
across processes (the full-size image encoder alone compiles for minutes).
Called automatically by FloatPipeline; idempotent.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("float_tpu.cache")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        "FLOAT_TPU_CACHE", os.path.expanduser("~/.cache/float_tpu/xla"))
    # Namespace by host ISA: XLA's own cache key does NOT fully cover CPU
    # machine features, so a CPU AOT blob compiled on a wider-ISA host
    # LOADS here with only a "could lead to SIGILL" warning (observed on
    # this image — the cache dir persists across differently-featured
    # hosts).  Same fix as aot_cache._host_fingerprint, which exists for
    # exactly this reason.
    from .aot_cache import _host_fingerprint
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        logger.info("persistent compilation cache at %s", cache_dir)
    except Exception as exc:        # older jax or read-only fs: non-fatal
        logger.warning("could not enable compilation cache: %s", exc)
