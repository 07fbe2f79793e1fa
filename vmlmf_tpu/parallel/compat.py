"""JAX version compatibility shims for the parallelism layer.

One place for the guarded `shard_map` import (jax >= 0.8 moved it from
`jax.experimental.shard_map` to `jax.shard_map` and renamed `check_rep` to
`check_vma`).  Everything in the repo that shard_maps — the pipeline-parallel
wavefront, the sharded ranker retrieval, and the fused-kernel SPMD wrapper —
imports from here so older-jax support cannot rot in one module while another
keeps it.
"""

from __future__ import annotations

import functools

try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    shard_map = functools.partial(_shard_map, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    shard_map = functools.partial(_shard_map, check_rep=False)
