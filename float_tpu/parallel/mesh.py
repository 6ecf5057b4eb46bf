"""Device mesh construction for multi-chip execution.

The reference has no parallelism at all (SURVEY §2.10) — its only scheme is
sequential on/offload.  The TPU-native equivalents implemented here:

- ``data`` axis: batch parallelism across chips (multiple clips / the
  reference FloatProcess batch loop, nodes.py:189-211),
- ``model`` axis: tensor parallelism for the wide layers (FMT MLP/heads,
  wav2vec2 towers) and frame parallelism for the embarrassingly-parallel
  decode stage (SURVEY §5.7).

Collectives are inserted by XLA GSPMD from NamedSharding annotations —
there is no hand-written NCCL-style backend to port.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              data: int | None = None,
              model: int | None = None,
              devices=None) -> Mesh:
    """Build a 2-axis ("data", "model") mesh.

    Defaults: all available devices, model axis as large as possible up to 8
    while keeping the device count divisible.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None and model is None:
        model = 1
        for cand in (4, 2):            # keep a real data axis when possible
            if n % cand == 0 and n // cand >= 1:
                model = cand
                break
        data = n // model
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim ``axis`` over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))
