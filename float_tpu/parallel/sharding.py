"""Sharding rules: tensor-parallel FMT, data-parallel batch, frame-parallel
decode.

Strategy (scaling-book style: annotate shardings, let GSPMD insert
collectives over ICI):

- FMT tensor parallelism ("model" axis): attention qkv/out projections are
  sharded head-wise, the MLP fc1/fc2 over the hidden dimension — the classic
  Megatron split, expressed purely as NamedShardings on the weight pytree.
  Activations stay replicated per data shard; XLA inserts the reduce-scatter
  /all-reduce pair on the block boundaries.
- wav2vec2 towers: same head/hidden split for the encoder layers.
- decode frame parallelism: the frame batch is sharded over the mesh; every
  frame is independent (SURVEY §5.7) so no collectives are needed beyond
  the initial broadcast of feats/params.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh, *spec):
    return NamedSharding(mesh, P(*spec))


def fmt_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for the FMT params (Megatron-style TP).

    torch weight layout (out, in):
      qkv.weight (3H, H)    -> shard out (heads)     = P("model", None)
      proj.weight (H, H)    -> shard in              = P(None, "model")
      fc1.weight (4H, H)    -> shard out             = P("model", None)
      fc2.weight (H, 4H)    -> shard in              = P(None, "model")
    everything else replicated.
    """
    def rule(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = ".".join(keys)
        if ".attn.qkv.weight" in "." + joined or joined.endswith("qkv.weight"):
            return _ns(mesh, "model", None)
        if joined.endswith("qkv.bias"):
            return _ns(mesh, "model")
        if joined.endswith("attn.proj.weight"):
            return _ns(mesh, None, "model")
        if joined.endswith("fc1.weight"):
            return _ns(mesh, "model", None)
        if joined.endswith("fc1.bias"):
            return _ns(mesh, "model")
        if joined.endswith("fc2.weight"):
            return _ns(mesh, None, "model")
        return _ns(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def wav2vec2_param_shardings(params: Any, mesh: Mesh) -> Any:
    """TP shardings for a wav2vec2 tower: attention head split + MLP split."""
    def rule(path, leaf):
        joined = ".".join(getattr(p, "key", str(p)) for p in path)
        if any(joined.endswith(s) for s in
               ("q_proj.weight", "k_proj.weight", "v_proj.weight")):
            return _ns(mesh, "model", None)
        if any(joined.endswith(s) for s in
               ("q_proj.bias", "k_proj.bias", "v_proj.bias")):
            return _ns(mesh, "model")
        if joined.endswith("out_proj.weight"):
            return _ns(mesh, None, "model")
        if joined.endswith("intermediate_dense.weight"):
            return _ns(mesh, "model", None)
        if joined.endswith("intermediate_dense.bias"):
            return _ns(mesh, "model")
        if joined.endswith("output_dense.weight"):
            return _ns(mesh, None, "model")
        return _ns(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: _ns(mesh), params)


def shard_pytree(params: Any, shardings: Any) -> Any:
    """device_put a pytree onto its sharding pytree."""
    return jax.tree.map(jax.device_put, params, shardings)
