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


# -- Orbax interop -----------------------------------------------------------
# The ecosystem-standard checkpointer, for users whose infra already speaks
# Orbax (async/multi-host checkpointing, GCS paths).  The npz format above
# stays the default: dependency-free, diffable, and sufficient for the
# reference's workloads.

def save_checkpoint_orbax(path, state):
    """Write `state` (any pytree) as an Orbax PyTree checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state)
    return path


def load_checkpoint_orbax(path, like=None, *, shardings=None):
    """Restore an Orbax checkpoint; with `like`/`shardings`, restore each
    leaf directly onto its mesh shards (sharding-aware restore)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            if shardings is not None:
                restore_args = jax.tree_util.tree_map(
                    lambda _, s: ocp.ArrayRestoreArgs(sharding=s),
                    like, shardings)
            else:
                restore_args = jax.tree_util.tree_map(
                    lambda _: ocp.RestoreArgs(), like)
            state = ckptr.restore(os.path.abspath(path),
                                  args=ocp.args.PyTreeRestore(
                                      item=like, restore_args=restore_args))
        else:
            state = ckptr.restore(os.path.abspath(path))
    if shardings is not None and like is None:
        state = jax.device_put(state, shardings)
    return state
