"""Device-mesh construction.

The reference has no distributed execution of any kind (SURVEY.md §2.3); this
layer is designed from scratch for TPU pods: a named 2-D mesh with a ``data``
axis (batch parallelism — gradients psum over ICI) and a ``model`` axis
(vocab-sharded embedding/softmax for the LM head).  On a real slice the mesh
axes should be laid out so ``model`` rides the faster ICI ring; XLA lowers all
collectives from sharding annotations — no hand-written transport.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data=None, model=1, *, devices=None):
    """Mesh over (data, model). ``data=None`` -> all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, f"need {data}x{model} devices, have {n}"
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (multi-slice / DCN) process initialization.

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  Safe to call when already initialized or
    single-process (no-op).  After this, `jax.devices()` is global and
    `make_mesh` spans all hosts — lay `data` across hosts (gradient psum rides
    DCN once per step) and keep `model` intra-slice (ICI).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process environment


def local_batch_slice(global_batch):
    """Rows of the global batch owned by this process (per-host input
    pipelines feed `jax.make_array_from_process_local_data`)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
