"""Sharding specs: data-parallel training, vocab-sharded LM head.

Design (BASELINE.json north-star; nothing to port — the reference is strictly
single-device):

  * HAR training — pure data parallelism: batch split on ``data``, params
    replicated; XLA inserts the gradient ``psum`` over ICI from the sharding
    annotations alone.
  * LM training — recurrent towers data-parallel; the two big vocab tables
    (embedding ``[V, H]`` and softmax projection ``[H, V]`` + bias) are
    row/column-sharded on ``model``.  The embedding gather and the softmax
    normalization over the sharded vocab axis lower to all-gather/psum over
    ICI automatically.  This keeps the O(V·H) memory and the O(T·B·V) logits
    sharded — the parts that actually scale with vocabulary.

All functions return pytrees of `NamedSharding` matching the param pytrees, so
callers can `jax.jit(step, in_shardings=..., ...)` or `jax.device_put`.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, ndim, axis=0):
    """Shard dim `axis` of an ndim-array on the mesh's data axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def _tree_fill(tree, sharding):
    return jax.tree_util.tree_map(lambda _: sharding, tree)


def har_param_sharding(params, mesh):
    """HAR nets: replicate everything (DP)."""
    return _tree_fill(params, replicated(mesh))


def lm_param_sharding(params, mesh):
    """LM: vocab-shard embed table and softmax projection on 'model'."""
    shardings = _tree_fill(params, replicated(mesh))
    shardings["embed"]["w"] = NamedSharding(mesh, P("model", None))  # [V, H]
    if "w" in params["fc"]:  # absent under tie_embeddings (derived from embed)
        shardings["fc"]["w"] = NamedSharding(mesh, P(None, "model"))  # [H, V]
    shardings["fc"]["b"] = NamedSharding(mesh, P("model"))           # [V]
    return shardings


def lm_state_sharding(states, mesh):
    """Recurrent states: batch-sharded on 'data' (dim 0 of [B, H])."""
    s = NamedSharding(mesh, P("data", None))
    return jax.tree_util.tree_map(lambda _: s, states)


def shard_params(params, shardings):
    return jax.device_put(params, shardings)
